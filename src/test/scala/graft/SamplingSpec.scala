package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Content-hash sampling: the properties RNG sampling can't give —
  * stability under repartitioning and exact reproducibility. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf01)

  test("fraction is respected within binomial tolerance") {
    val n = docs.count().toDouble
    val kept = Sampling.contentHashSample(docs, $"text", 0.25).count().toDouble
    // 3 sigma for Binomial(500, 0.25) ≈ 29
    assert(math.abs(kept - 0.25 * n) < 4 * math.sqrt(n * 0.25 * 0.75),
      s"kept $kept of $n at fraction 0.25")
  }

  test("membership is invariant under repartitioning (RNG sample is not)") {
    val a = Sampling.contentHashSample(docs, $"text", 0.3)
      .select($"doc_id").as[Long].collect().toSet
    val b = Sampling.contentHashSample(docs.repartition(7), $"text", 0.3)
      .select($"doc_id").as[Long].collect().toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("different seeds draw different subsets; same seed identical") {
    val a = Sampling.contentHashSample(docs, $"text", 0.3, seed = 1L)
      .select($"doc_id").as[Long].collect().toSet
    val b = Sampling.contentHashSample(docs, $"text", 0.3, seed = 2L)
      .select($"doc_id").as[Long].collect().toSet
    val a2 = Sampling.contentHashSample(docs, $"text", 0.3, seed = 1L)
      .select($"doc_id").as[Long].collect().toSet
    assert(a === a2)
    assert(a !== b)
  }

  test("fraction edge cases: 0 keeps nothing, 1 keeps everything") {
    assert(Sampling.contentHashSample(docs, $"text", 0.0).count() === 0L)
    assert(Sampling.contentHashSample(docs, $"text", 1.0).count() === docs.count())
  }

  test("mixByStratum applies per-stratum fractions and the default") {
    val mixed = Sampling.mixByStratum(docs, $"text", $"lang",
      Map("en" -> 1.0), defaultFraction = 0.0)
    val langs = mixed.select($"lang").distinct().as[String].collect().toSet
    assert(langs === Set("en"))
    assert(mixed.count() === docs.filter($"lang" === "en").count())
  }
}
