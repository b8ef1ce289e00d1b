package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document keyword extraction: the top-k terms of each document by
  * tf·idf — the labeling/routing primitive of a training-data pipeline
  * (topic tagging, per-doc summaries for curation review, sparse
  * retrieval features) distilled to its relational core.
  *
  * idf = ln((N+1)/(df+1)) — the add-one form, ≥ 0 for every df ≤ N and
  * never a division by zero, matching the classic smoothed variant (the
  * reference's IDF stage uses MLlib's same smoothing,
  * `/root/reference/model_logistic_regression.py:99-101`). The score
  * quantizes to the 1e-9 integer grid BEFORE ranking (the repo's
  * cross-engine ordering discipline), ties break by token ascending.
  *
  * Scale shape: one (doc, token) wordcount aggregate, one
  * vocabulary-sized df aggregate joined back on the token key, the
  * 1-row corpus count as a broadcast scalar, then ONE window over the
  * doc-id shuffle whose per-group sort is bounded by tokens-per-doc —
  * never a corpus-wide sort. `minDf` prunes hapax noise BEFORE the
  * join (and is the knob that keeps the vocabulary side honest at
  * 100 TB — a df ≥ 2 filter drops the long tail that dominates raw
  * vocabulary size). */
object Keywords {

  /** (idCol, rank 1..k, token, score_nano) per document. Documents with
    * no token passing `minDf` emit nothing. */
  def docKeywords(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minDf: Long = 2L): DataFrame = {
    require(k > 0, s"docKeywords needs k > 0, got $k")
    require(minDf >= 1L, s"minDf must be >= 1, got $minDf")
    val tf = docs
      .select(col(idCol), explode(TokenOps.tokenize(col(textCol))).as("token"))
      // the whitespace-run split emits "" for empty/blank text (the
      // tokenize contract BM25 shares); the empty string is not a
      // keyword — drop it here, and the mirror drops it identically
      .filter(col("token") =!= "")
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val n = docs.agg(count(lit(1)).as("__n"))
    val scored = tf.join(dfreq, Seq("token"))
      .crossJoin(broadcast(n)) // 1-row scalar: corpus size for idf
      .withColumn("score_nano",
        round(col("tf").cast("double") *
          log((col("__n").cast("double") + 1.0) /
            (col("df").cast("double") + 1.0)) * 1e9).cast("long"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_nano").desc, col("token"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank").cast("long").as("rank"),
        col("token"), col("score_nano"))
  }
}
