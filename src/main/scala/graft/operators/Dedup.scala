package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact deduplication operators (LLM-pipeline extension surface).
  *
  * `dropDuplicates` picks an ARBITRARY survivor per key (whichever row a
  * task sees first) — fine interactively, wrong for a reproducible 100 TB
  * pipeline. Both operators here are deterministic:
  *
  *  - `exact`: keep the min-`tiebreak` row per key via windowed
  *    row_number. One shuffle on the key columns; the window sort is
  *    per-key in-memory (keys are small groups after hashing).
  *  - `exactByFingerprint`: dedup by a content hash (e.g.
  *    [[TokenOps.bagOfWordsFingerprint]]) — the cheap cascade stage
  *    before MinHash/SimHash near-dup (see MinHashDedup).
  *
  * Skew note: a pathological key (e.g. empty text) concentrates one
  * partition; AQE skew-join splitting does not apply to windows, so for
  * known-skewed corpora fingerprint first (hash keys distribute evenly).
  */
object Dedup {

  /** Deterministic exact dedup: keep the row with the smallest `tiebreak`
    * per distinct combination of `keys`. */
  def exact(df: DataFrame, keys: Seq[String], tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tiebreak.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Dedup by a computed fingerprint column, keeping min-tiebreak row.
    * Returns the input columns plus the fingerprint. */
  def exactByFingerprint(df: DataFrame, fingerprint: Column,
      tiebreak: Column, fpCol: String = "fp"): DataFrame =
    exact(df.withColumn(fpCol, fingerprint), Seq(fpCol), tiebreak)

  /** Per-key duplicate statistics: survivor id + group size. A pure
    * aggregation form (map-side combine, no window) — cheaper than `exact`
    * when only the survivor key and counts are needed. */
  def dupStats(df: DataFrame, keys: Seq[String], idCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))

  /** Benchmark decontamination: drop corpus rows whose content
    * fingerprint appears in `benchmark` (the train/eval-overlap removal
    * every training-data pipeline runs before release). Fingerprints are
    * order-invariant bags of words ([[TokenOps.bagOfWordsFingerprint]]),
    * so trivially reordered copies of an eval item are caught too. The
    * benchmark side is fingerprints-only and deduped. The broadcast hint
    * is explicit (eval benchmarks are thousands-of-rows, orders below
    * any corpus) so the corpus is NEVER shuffled on the fingerprint; for
    * a benchmark side too large to broadcast, drop the hint and accept
    * the shuffle. */
  def decontaminate(corpus: DataFrame, textCol: String,
      benchmark: DataFrame, benchTextCol: String): DataFrame = {
    val benchFp = broadcast(benchmark
      .select(TokenOps.bagOfWordsFingerprint(col(benchTextCol)).as("__bfp"))
      .distinct())
    corpus.join(benchFp,
      TokenOps.bagOfWordsFingerprint(col(textCol)) === col("__bfp"),
      "left_anti")
  }
}
