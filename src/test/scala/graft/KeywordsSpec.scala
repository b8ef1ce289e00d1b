package graft

import org.apache.spark.sql.functions._
import graft.operators.Keywords

/** Per-document tf·idf keywords: brute-force parity on a hand corpus,
  * minDf pruning, deterministic ties. Fixture-level value checks are
  * the DuckDB oracle (`q_doc_keywords`). */
class KeywordsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "banana cherry cherry date"),
    (3L, "apple egg egg egg"),
    (4L, "")).toDF("doc_id", "text")

  test("docKeywords == driver brute force of tf * ln((N+1)/(df+1))") {
    val got = Keywords.docKeywords(docs, "doc_id", "text", k = 2,
        minDf = 1L)
      .select($"doc_id", $"rank", $"token", $"score_nano")
      .as[(Long, Long, String, Long)].collect().toSet
    // brute force with the identical double chain
    val toks = docs.as[(Long, String)].collect().toSeq.map {
      case (id, t) => id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty)
    }
    val n = docs.count().toDouble
    val tf = toks.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (w, g) => (id, w, g.length.toLong) }
    }
    val dfm = tf.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
    val want = tf.map { case (id, w, f) =>
      (id, w, math.round(f.toDouble *
        math.log((n + 1.0) / (dfm(w).toDouble + 1.0)) * 1e9))
    }.groupBy(_._1).flatMap { case (_, rows) =>
      rows.sortBy { case (_, w, s) => (-s, w) }.take(2).zipWithIndex
        .map { case ((id, w, s), i) => (id, (i + 1).toLong, w, s) }
    }.toSet
    assert(got === want)
    // the empty document emits nothing
    assert(!got.exists(_._1 == 4L))
  }

  test("minDf prunes hapax terms before ranking") {
    val got = Keywords.docKeywords(docs, "doc_id", "text", k = 3,
        minDf = 2L)
      .select($"token").as[String].collect().toSet
    // date (df=1) and egg (df=1) cannot surface; shared terms can
    assert(!got.contains("date") && !got.contains("egg"))
    assert(got.subsetOf(Set("apple", "banana", "cherry")))
  }

  test("equal scores break ties by token ascending") {
    // two tokens with identical tf and df in the same doc
    val d = Seq((1L, "bb aa"), (2L, "aa bb")).toDF("doc_id", "text")
    val top = Keywords.docKeywords(d, "doc_id", "text", k = 1, minDf = 1L)
      .select($"doc_id", $"token").as[(Long, String)].collect().toMap
    assert(top(1L) === "aa" && top(2L) === "aa")
  }

  test("guards: k and minDf must be positive") {
    intercept[IllegalArgumentException] {
      Keywords.docKeywords(docs, "doc_id", "text", k = 0)
    }
    intercept[IllegalArgumentException] {
      Keywords.docKeywords(docs, "doc_id", "text", k = 1, minDf = 0L)
    }
  }
}
