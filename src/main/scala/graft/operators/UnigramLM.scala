package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Unigram language-model scoring: fit add-one-smoothed token
  * probabilities on the corpus itself, then score every document by its
  * mean negative log-likelihood — the classic cheap "LM loss" quality
  * signal for training-data curation (high NLL ⇒ the document is unlike
  * the corpus: boilerplate, noise, wrong language; low NLL ⇒ generic,
  * repetitive text). Complements the rule-based quality/Gopher signals in
  * [[TokenOps]] with a corpus-adaptive one.
  *
  * Model: p(t) = (c_t + 1) / (N + V) over whitespace tokens (the same
  * [[TokenOps.tokenize]] convention every token oracle shares), where
  * c_t = corpus count, N = Σ c_t, V = |vocab|.
  *
  * Plan shape at 100 TB:
  *   1. one explode → `groupBy(token)` builds the count table —
  *      vocabulary-sized output (sublinear in corpus), partial-aggregated
  *      map-side;
  *   2. the 1-row (N, V) frame derives from the counts, broadcast back;
  *   3. scoring re-explodes and equi-joins tokens→counts (the one keyed
  *      shuffle; a bounded vocab could broadcast instead, but vocabulary
  *      at web scale is not broadcast-safe by default), then per-doc
  *      aggregation.
  *
  * Determinism: each token's −ln p quantizes onto a 1e-9 integer grid
  * BEFORE the per-document sum (the money-sum discipline: double
  * summation order varies with the plan; integer sums don't), so the
  * score is bit-stable across engines and partitionings and the query is
  * oracle-checkable.
  */
object UnigramLM {

  /** (token, c) corpus counts under the shared tokenizer. */
  def tokenCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TokenOps.tokenize(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))

  /** Per-token −ln p(t) on the 1e-9 grid, as a Column over (c, n, v). */
  private def nllQuantized(c: Column, n: Column, v: Column): Column =
    round(-log((c + lit(1L)).cast("double") / (n + v).cast("double"))
      * lit(1e9)).cast("long")

  /** (id, n_tokens, nll): mean per-token negative log-likelihood,
    * rounded to 6dp. Documents with zero tokens cannot occur under the
    * whitespace tokenizer (splitting any string yields ≥1 token, possibly
    * empty-string — which is itself a vocabulary entry, same as the
    * oracle's unnest). */
  def nll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // localCheckpoint the vocabulary-sized count table: the stats
    // aggregate and the scoring join would otherwise each re-execute
    // the full corpus explode+groupBy lineage — three corpus
    // tokenization passes for one query instead of one
    val counts = tokenCounts(docs, textCol).localCheckpoint()
    val stats = counts.agg(sum(col("c")).as("n"),
      count(lit(1)).as("v"))
    val toks = docs.select(col(idCol),
      explode(TokenOps.tokenize(col(textCol))).as("token"))
    toks.join(counts, "token")
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        nllQuantized(col("c"), col("n"), col("v")).as("nq"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("nq")).cast("double") / lit(1e9)
          / count(lit(1)).cast("double"), 6).as("nll"))
  }
}
