package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Substring-level (span) deduplication: detect and trim text SPANS that
  * repeat across documents, the token-k-gram approximation of
  * suffix-array substring dedup (Lee et al., "Deduplicating Training
  * Data Makes Language Models Better", ACL 2022 — their ExactSubstr
  * dedups 50-token spans; the reference repo dedups whole texts only,
  * /root/reference/preprocessing.py:99-108). Document-level dedup
  * ([[Dedup]]) misses boilerplate INSIDE otherwise-distinct documents
  * (headers, licenses, templated paragraphs) — the dominant duplication
  * mode in web corpora and exactly what membership-inference work
  * measures. A k-token sliding window over the whitespace tokenization
  * keeps the operator closed-form (deterministic, DuckDB-mirrorable)
  * where a true suffix array would not be.
  *
  * Ownership convention: the LOWEST doc_id containing a gram owns it;
  * every other occurrence is a duplicated span. This is the same
  * min-id-survivor rule as [[Dedup.exact]], so doc-level and span-level
  * dedup compose without double-counting the canonical copy.
  *
  * Scale shape (100 TB): ONE lineage pass — k-gram explode →
  * `groupBy(gram, doc_id)` partial-aggregated count (the wordcount
  * shuffle, keyed on the high-cardinality gram), an unordered
  * `min(doc_id) over (partition by gram)` window on the REDUCED
  * (gram, doc) rows for ownership, then a `groupBy(doc_id)` rollup.
  * No self-join, nothing materialized twice, no broadcast of
  * corpus-sized state; hot grams (a boilerplate span shared by millions
  * of docs) cost one reduced row per (gram, doc), not one per
  * occurrence, because the count aggregate collapses within-doc repeats
  * before the window. At 100 TB prefer hashing the gram string to a
  * 64-bit key for the shuffle (xxhash64 — the [[MinHashDedup]]
  * discipline); the string form here keeps the oracle mirror exact.
  */
object SpanDedup {

  /** (doc_id, pos, gram) — one row per k-token window (1-based pos);
    * documents shorter than k tokens contribute no rows. */
  def spanGrams(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"span width k must be >= 1, got $k")
    val toks = TokenOps.tokenize(col(textCol))
    // when(size >= k) guards sequence(1, size-k+1): Spark's sequence
    // DESCENDS when end < start instead of being empty
    docs.select(col(idCol).as("doc_id"),
        when(size(toks) >= k,
          transform(sequence(lit(1), size(toks) - k + 1),
            i => concat_ws(" ", slice(toks, i, lit(k)))))
          .otherwise(array().cast("array<string>")).as("__grams"))
      .select(col("doc_id"),
        posexplode(col("__grams")).as(Seq("__i", "gram")))
      .select(col("doc_id"), (col("__i") + 1).cast("long").as("pos"),
        col("gram"))
  }

  /** Per-document duplicated-span profile: (doc_id, n_spans,
    * n_dup_spans, dup_ratio, keep) for EVERY input document
    * (span-free short docs zero-filled, keep=1). A span is duplicated
    * iff its gram's owner (lowest containing doc_id) is another doc;
    * `keep` = dup_ratio <= tau — the Lee-et-al-style retention cut. */
  def stats(docs: DataFrame, idCol: String, textCol: String,
      k: Int, tau: Double): DataFrame = {
    require(tau >= 0.0 && tau <= 1.0, s"tau must be in [0,1], got $tau")
    val g = spanGrams(docs, idCol, textCol, k)
    val w = Window.partitionBy(col("gram"))
    val per = g.groupBy(col("gram"), col("doc_id"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__owner", min(col("doc_id")).over(w))
      .groupBy(col("doc_id"))
      .agg(sum(col("__n")).as("n_spans"),
        sum(when(col("__owner") < col("doc_id"), col("__n"))
          .otherwise(lit(0L))).as("n_dup_spans"))
    docs.select(col(idCol).as("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"))
      .withColumn("dup_ratio", when(col("n_spans") === 0, lit(0.0))
        .otherwise(round(
          col("n_dup_spans").cast("double") / col("n_spans"), 6)))
      .withColumn("keep", (col("dup_ratio") <= tau).cast("long"))
  }

  /** Trim duplicated spans OUT of the text: drop every token covered by
    * at least one duplicated k-gram window (token position t is covered
    * by window starts in [t-k+1, t]), keep the rest in order, re-join
    * with single spaces. A doc's OWNED grams are never themselves dup
    * windows in that doc, so an owner with no foreign duplication keeps
    * its text whole; but spans CHAIN — an owner that itself duplicates
    * an earlier doc's span can have owned grams overlap its own trimmed
    * region, in which case that span's canonical copy shrinks too (the
    * same overlap behavior as suffix-array ExactSubstr when duplicate
    * ranges from different sources overlap; SpanDedupSpec measures the
    * effect and pins the guarantee for chain-free owners). Callers who
    * need hard span preservation should trim only `keep=0` docs from
    * [[stats]] instead of token-trimming everything. Output:
    * (doc_id, text, n_tokens_kept, n_tokens_dropped).
    *
    * Same one-lineage shape as [[stats]] plus one join back to the
    * token arrays and a row-local coverage fold — the dup-position list
    * per doc is bounded by the doc's own token count. */
  def trimDupSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"span width k must be >= 1, got $k")
    val g = spanGrams(docs, idCol, textCol, k)
    val w = Window.partitionBy(col("gram"))
    // duplicated window-start positions per doc (occurrence-level: the
    // within-doc repeat of an owned gram is NOT a dup in the owner doc)
    val dupPos = g
      .withColumn("__owner", min(col("doc_id")).over(w))
      .filter(col("__owner") < col("doc_id"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("__dups"))
    val toks = TokenOps.tokenize(col(textCol))
    docs.select(col(idCol).as("doc_id"), toks.as("__toks"))
      .join(dupPos, Seq("doc_id"), "left")
      .select(col("doc_id"), col("__toks"),
        coalesce(col("__dups"), array().cast("array<long>")).as("__dups"))
      .select(col("doc_id"), size(col("__toks")).cast("long").as("__total"),
        // token t (1-based) survives iff NO dup window start lies in
        // [t-k+1, t]
        filter(zip_with(col("__toks"),
            sequence(lit(1), size(col("__toks"))),
            (tok, t) => struct(tok.as("tok"),
              (!exists(col("__dups"), p =>
                p >= t - (k - 1) && p <= t.cast("long"))).as("kept"))),
          s => s.getField("kept")).as("__kept"))
      .select(col("doc_id"),
        concat_ws(" ", transform(col("__kept"), s => s.getField("tok")))
          .as("text"),
        size(col("__kept")).cast("long").as("n_tokens_kept"),
        (col("__total") - size(col("__kept"))).as("n_tokens_dropped"))
  }
}
