package graft

import org.apache.spark.sql.functions._
import graft.operators.{Collocations, TokenOps}

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("pmiPairs == driver brute force over document presence sets") {
    val docs = Tables.documents(spark, sf001)
    val got = Collocations.pmiPairs(docs, "doc_id", "text",
        minDf = 3L, minPairDf = 3L)
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    val sets = docs.select($"doc_id",
        TokenOps.tokenize($"text").as("t"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, t) => id -> t.toSet }
    val n = sets.length.toLong
    val dfm = sets.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toMap.filter(_._2 >= 3L)
    val want = (for {
      a <- dfm.keys; b <- dfm.keys if a < b
      nab = sets.count(s => s._2(a) && s._2(b)).toLong if nab >= 3L
    } yield (a, b, nab, dfm(a), dfm(b),
      math.round(math.log(nab.toDouble * n / (dfm(a) * dfm(b))) * 1e9))
    ).toSet
    assert(got === want)
    assert(got.nonEmpty, "fixture must produce collocations")
  }

  test("a genuinely associated pair scores above an independent one") {
    // 20 docs: 'x y' co-occur in exactly the docs either appears in
    // (perfect association at df 10); 'p'/'q' co-occur in 5 — exactly
    // the independence expectation df_p*df_q/N = 10*10/20 = 5
    val docs = (0 until 20).map { i =>
      val xy = if (i < 10) "x y" else "f g"
      val pq = if (i < 5) "p q" else if (i < 10) "p"
        else if (i < 15) "q" else "r"
      (i.toLong, s"$xy $pq")
    }.toDF("doc_id", "text")
    val out = Collocations.pmiPairs(docs, "doc_id", "text",
        minDf = 3L, minPairDf = 3L)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._6).toMap
    assert(out(("x", "y")) > 0L, "perfect collocation must have PMI > 0")
    assert(out(("p", "q")) === 0L, "chance-level pair must have PMI = 0")
    assert(out(("x", "y")) > out(("p", "q")))
  }

  test("the candidate-volume guard trips before the self-join runs") {
    val docs = Tables.documents(spark, sf001)
    val e = intercept[IllegalArgumentException] {
      Collocations.pmiPairs(docs, "doc_id", "text",
        minDf = 1L, minPairDf = 1L, maxCandidates = 10L).count()
    }
    assert(e.getMessage.contains("would produce"))
  }
}
