package graft

import org.apache.spark.sql.functions._
import graft.operators.EmbedNormalize

class EmbedNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("standardized dimensions have micro-grid mean 0 and variance 1") {
    val emb = Tables.embeddings(spark, sf001)
      .select($"vec_id", $"embedding")
    val z = EmbedNormalize.standardize(emb, "embedding")
      .select(posexplode($"z").as(Seq("pos", "zv")))
    val stats = z.groupBy($"pos")
      .agg(avg($"zv").as("m"), avg($"zv" * $"zv").as("m2"))
      .as[(Int, Double, Double)].collect()
    assert(stats.nonEmpty)
    stats.foreach { case (p, m, m2) =>
      // z is the exact micro-grid z-score: mean 0 up to the 1e-6
      // quantization of the INPUT grid, variance 1 likewise
      assert(math.abs(m) < 1e-6, s"dim $p mean $m")
      assert(math.abs(m2 - 1.0) < 1e-3, s"dim $p second moment $m2")
    }
  }

  test("zero-variance dimension standardizes to 0, not NaN") {
    val emb = Seq(
      (1L, Seq(1.0f, 5.0f)), (2L, Seq(2.0f, 5.0f)), (3L, Seq(3.0f, 5.0f))
    ).toDF("vec_id", "embedding")
    val z = EmbedNormalize.standardize(emb, "embedding")
      .select($"vec_id", $"z").as[(Long, Seq[Double])].collect().toMap
    assert(z.values.forall(v => v(1) == 0.0), z.toString)
    assert(z(1L)(0) < 0 && z(3L)(0) > 0 && !z.values.exists(_.exists(_.isNaN)))
  }

  test("ragged embeddings fail loudly") {
    val emb = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      EmbedNormalize.standardize(emb, "embedding").count()
    }
    assert(e.getMessage.contains("ragged"))
  }

  test("standardize is partitioning-invariant (exact-moment contract)") {
    val emb = Tables.embeddings(spark, sf001)
      .select($"vec_id", $"embedding")
    def run(df: org.apache.spark.sql.DataFrame) =
      EmbedNormalize.standardize(df, "embedding")
        .select($"vec_id", $"z").as[(Long, Seq[Double])].collect().toMap
    val a = run(emb)
    val b = run(emb.repartition(7))
    assert(a === b, "z must be bit-identical under repartitioning")
  }
}
