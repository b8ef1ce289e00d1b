package graft

import org.apache.spark.sql.functions._
import graft.operators.{SpanDedup, TokenOps}

/** Span-level dedup invariants beyond the oracle: ownership semantics,
  * trim coverage math, the canonical-copy-survives guarantee, and the
  * brute-force equality of the per-doc profile. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("stats equal a driver-recomputed brute force on a crafted corpus") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a quick brown fox ran away"), // shares 'quick brown fox' (owner 1)
      (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (4L, "completely different words here"),
      (5L, "xy")) // shorter than K tokens: zero spans
    val got = SpanDedup.stats(d, "doc_id", "text", K, tau = 0.5)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Long)].collect().toSeq
    // brute force in scala
    val toks = d.collect().map(r => r.getLong(0) ->
      r.getString(1).toLowerCase.split("\\s+").toSeq).toMap
    val grams = toks.view.mapValues(t =>
      if (t.length < K) Seq.empty
      else t.sliding(K).map(_.mkString(" ")).toSeq).toMap
    val owner = grams.toSeq.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = d.collect().map(_.getLong(0)).sorted.map { id =>
      val gs = grams(id)
      val nd = gs.count(g => owner(g) < id)
      val ratio = if (gs.isEmpty) 0.0
        else BigDecimal(nd.toDouble / gs.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, gs.size.toLong, nd.toLong, ratio, if (ratio <= 0.5) 1L else 0L)
    }.toSeq
    assert(got == want)
    // the exact dup (3) is fully duplicated; the partial overlap (2)
    // keeps under the cut; the owner (1) is clean
    assert(got.find(_._1 == 3L).get._4 == 1.0)
    assert(got.find(_._1 == 1L).get._3 == 0L)
    assert(got.find(_._1 == 5L).get == ((5L, 0L, 0L, 0.0, 1L)))
  }

  test("trim removes exactly the covered tokens; canonical copy untouched") {
    val d = docs(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "zeta alpha beta gamma eta theta")) // dup span 'alpha beta gamma'
    val got = SpanDedup.trimDupSpans(d, "doc_id", "text", K)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    // owner keeps its whole text (tokens re-joined)
    assert(got.head == ((1L, "alpha beta gamma delta epsilon", 5L, 0L)))
    // doc 2: window start at token 2 is duplicated -> tokens 2,3,4
    // covered; 'zeta eta theta' survive
    assert(got(1) == ((2L, "zeta eta theta", 3L, 3L)))
  }

  test("chain-free owners keep every owned dup span after trimming") {
    val d = Tables.documents(spark, sf001).select(col("doc_id"), col("text"))
    val trimmed = SpanDedup.trimDupSpans(d, "doc_id", "text", K)
    // kept+dropped == original token count, for every doc
    val counts = trimmed
      .join(d.select(col("doc_id"),
        size(TokenOps.tokenize(col("text"))).cast("long").as("total")),
        "doc_id")
    assert(counts.filter(col("n_tokens_kept") + col("n_tokens_dropped")
      =!= col("total")).count() == 0)
    // The guarantee the scaladoc states: an owner with NO foreign dup
    // spans of its own is untouched, so every gram it owns survives.
    // (Chained owners — docs that both own spans and duplicate earlier
    // docs' spans — may shrink; that's the documented ExactSubstr
    // overlap behavior, not a bug.)
    val gBefore = SpanDedup.spanGrams(d, "doc_id", "text", K)
    val owners = gBefore.groupBy("gram").agg(min(col("doc_id")).as("owner"))
    val withOwner = gBefore.join(owners, "gram")
    val chainedDocs = withOwner.filter(col("owner") < col("doc_id"))
      .select(col("doc_id")).distinct()
    val dupGramCleanOwners = withOwner
      .filter(col("owner") < col("doc_id"))
      .select(col("gram"), col("owner")).distinct()
      .join(chainedDocs.select(col("doc_id").as("owner")), Seq("owner"),
        "left_anti")
    assert(dupGramCleanOwners.count() > 0,
      "fixture must exercise the chain-free-owner case")
    val gAfter = SpanDedup.spanGrams(
      trimmed.select(col("doc_id"), col("text")), "doc_id", "text", K)
    val missing = dupGramCleanOwners.join(
      gAfter.select(col("gram"), col("doc_id").as("owner")).distinct(),
      Seq("gram", "owner"), "left_anti")
    assert(missing.count() == 0,
      "a chain-free owner lost an owned duplicated span")
    // and the trim actually did something on this fixture
    assert(trimmed.filter(col("n_tokens_dropped") > 0).count() > 0)
  }

  test("short docs and empty text produce zero spans, keep=1, no rows lost") {
    val d = docs((1L, ""), (2L, "one"), (3L, "one two"))
    val got = SpanDedup.stats(d, "doc_id", "text", K, tau = 0.5)
      .orderBy("doc_id").as[(Long, Long, Long, Double, Long)].collect()
    assert(got.toSeq == Seq((1L, 0L, 0L, 0.0, 1L), (2L, 0L, 0L, 0.0, 1L),
      (3L, 0L, 0L, 0.0, 1L)))
    val trimmed = SpanDedup.trimDupSpans(d, "doc_id", "text", K)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(trimmed.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(trimmed.forall(_._4 == 0L))
  }
}
