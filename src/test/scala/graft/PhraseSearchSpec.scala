package graft

import org.apache.spark.sql.functions._
import graft.operators.{PhraseSearch, TokenOps}

class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  test("phraseOccurrences == brute-force slide over real documents") {
    val docs = Tables.documents(spark, sf001)
    val phrase = Seq("table", "hash")
    val got = PhraseSearch.phraseOccurrences(docs, "doc_id", "text", phrase)
      .as[(Long, Long)].collect().toSet
    val want = docs.select($"doc_id", TokenOps.tokenize($"text").as("t"))
      .as[(Long, Seq[String])].collect().flatMap { case (id, t) =>
        t.sliding(phrase.size).zipWithIndex.collect {
          case (w, i) if w == phrase => (id, i + 1L)
        }
      }.toSet
    assert(got === want)
    assert(got.nonEmpty, "fixture must contain the phrase")
  }

  test("overlapping occurrences and duplicate phrase terms both count") {
    val docs = Seq((1L, "x x x y x x")).toDF("doc_id", "text")
    val got = PhraseSearch.phraseOccurrences(docs, "doc_id", "text",
        Seq("x", "x"))
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L), (1L, 2L), (1L, 5L)))
  }

  test("a term absent from the corpus short-circuits to empty") {
    val docs = Tables.documents(spark, sf001)
    val got = PhraseSearch.phraseOccurrences(docs, "doc_id", "text",
      Seq("table", "zzzznotaword"))
    assert(got.count() === 0L)
  }

  test("phraseCounts aggregates occurrences per document") {
    val docs = Seq((1L, "a b a b a b"), (2L, "a b"), (3L, "b a"))
      .toDF("doc_id", "text")
    val got = PhraseSearch.phraseCounts(docs, "doc_id", "text", Seq("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 1L))
  }
}
