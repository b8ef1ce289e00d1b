package graft

import org.apache.spark.sql.functions._
import graft.ml.IvfIndex
import graft.operators.{Salting, Similarity}

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("IVF top-k: probing half the cells recalls most of brute-force top-10") {
    val emb = Tables.embeddings(spark, sf01)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
      .select($"vec_id").as[Long].collect().toSet
    val q = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val model = IvfIndex.fit(emb.filter($"vec_id" =!= 0),
      "vec_id", "embedding", nlist = 8)
    val ann = IvfIndex.topK(model, "vec_id", q, 10, nprobe = 4)
      .select($"vec_id").as[Long].collect().toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.4, s"IVF recall $recall (exact=$exact ann=$ann)")
    // full probe == brute force
    val full = IvfIndex.topK(model, "vec_id", q, 10, nprobe = 8)
      .select($"vec_id").as[Long].collect().toSet
    assert(full === exact, "probing all cells must equal brute force")
  }

  test("ScaleBench.generate rejects scales past the alphabet-rotation wrap") {
    // at scale > 26 copy k and k-26 would be byte-identical text — the
    // quadratic N-clone artifact the construction exists to avoid must
    // fail loudly, before any generation work
    intercept[IllegalArgumentException] {
      ScaleBench.generate(spark, sf001, "target/never-written", 27)
    }
  }

  test("salted count equals plain groupBy count") {
    val li = Tables.lineitem(spark, sf001)
    val plain = li.groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Salting.saltedCount(li, Seq("l_returnflag"))
      .as[(String, Long)].collect().toMap
    assert(salted === plain)
  }

  test("salted cent-sum equals plain exact-cents sum") {
    val li = Tables.lineitem(spark, sf001)
    val plain = li.groupBy($"l_returnflag")
      .agg((sum(round($"l_extendedprice" * 100, 0).cast("long"))
        .cast("double") / 100.0).as("t"))
      .as[(String, Double)].collect().toMap
    val salted = Salting.saltedCentSum(li, Seq("l_returnflag"), "l_extendedprice")
      .as[(String, Double)].collect().toMap
    assert(salted === plain)
  }

  test("salted join equals plain join") {
    val li = Tables.lineitem(spark, sf001).select($"l_orderkey", $"l_quantity")
    val o = Tables.orders(spark, sf001).select($"o_orderkey", $"o_orderstatus")
    val plain = li.join(o, $"l_orderkey" === $"o_orderkey").count()
    val (big, small, saltCol) = Salting.saltedJoinSides(li, o, 8)
    val salted = big.join(small,
      big("l_orderkey") === small("o_orderkey") &&
      big(saltCol) === small(saltCol)).count()
    assert(salted === plain)
  }

  test("saltedJoin (complete form) row-equivalent to plain join, salt dropped") {
    val li = Tables.lineitem(spark, sf001)
      .select($"l_orderkey".as("okey"), $"l_quantity")
    val o = Tables.orders(spark, sf001)
      .select($"o_orderkey".as("okey"), $"o_orderstatus")
    val plain = li.join(o, Seq("okey"))
      .groupBy($"okey", $"o_orderstatus").count()
      .collect().toSet
    val salted = Salting.saltedJoin(li, o, Seq("okey"), salts = 8)
    assert(!salted.columns.contains("__salt"))
    assert(salted.groupBy($"okey", $"o_orderstatus").count()
      .collect().toSet === plain)
  }
}
