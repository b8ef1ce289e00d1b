package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-engine binned ROC / AUC (replaces the reference's driver-side
  * sklearn ROC, `model_logistic_regression.py:276-280`).
  *
  * Exact ROC needs a global sort by score — a single-partition window at
  * 100 TB. Instead scores are binned (default 1000 buckets): one hash
  * aggregation over the full data (map-side combined), then the running
  * TP/FP sums run over ≤`bins` rows, which is driver-trivial but kept
  * in-engine. AUC error vs exact is O(1/bins).
  */
object BinaryMetrics {

  /** ROC points from (score in [0,1], label in {0,1}). Returns
    * (threshold_bin, fpr, tpr) ordered by descending threshold. */
  def binnedRoc(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 1000): DataFrame = {
    val binned = df.select(
        least(floor(col(scoreCol) * bins), lit(bins - 1)).as("bin"),
        col(labelCol).cast("long").as("y"))
      .groupBy(col("bin"))
      .agg(sum(col("y")).as("pos"), (count(lit(1)) - sum(col("y"))).as("neg"))
    val w = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Totals via an unbounded window over the same (<= bins rows)
    // aggregate — one pass over the scored data, not two; single-class
    // input yields NULL rates rather than division-by-zero garbage.
    val whole = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    binned
      .withColumn("tp", sum(col("pos")).over(w))
      .withColumn("fp", sum(col("neg")).over(w))
      .withColumn("__p", sum(col("pos")).over(whole))
      .withColumn("__n", sum(col("neg")).over(whole))
      .select(col("bin"),
        (col("fp").cast("double") /
          when(col("__n") > 0, col("__n"))).as("fpr"),
        (col("tp").cast("double") /
          when(col("__p") > 0, col("__p"))).as("tpr"))
      .orderBy(col("bin").desc)
  }

  /** Trapezoidal AUC over the binned ROC. NaN for single-class input
    * (the ROC rates are NULL there; AUC is undefined, and a NaN answer
    * must not NPE the caller). */
  def binnedAuc(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 1000): Double =
    trapezoid(binnedRoc(df, scoreCol, labelCol, bins), "bin")

  private def trapezoid(roc: DataFrame, orderCol: String): Double = {
    val w = Window.orderBy(col(orderCol).desc)
    val r = roc
      .withColumn("prev_fpr", lag(col("fpr"), 1, 0.0).over(w))
      .withColumn("prev_tpr", lag(col("tpr"), 1, 0.0).over(w))
      .select(sum((col("fpr") - col("prev_fpr")) *
        (col("tpr") + col("prev_tpr")) / 2.0))
      .head()
    if (r.isNullAt(0)) Double.NaN else r.getDouble(0)
  }

  /** EXACT ROC — one point per DISTINCT score, cumulative TP/FP over
    * descending thresholds: the curve sklearn's `roc_curve` computes
    * (with `drop_intermediate=False`; the reference's driver-side call,
    * `model_logistic_regression.py:276-280`), kept fully in-engine.
    *
    * Shape: the heavy pass is a distributed hash aggregation keyed by
    * score (map-side combined, like [[binnedRoc]]); the cumulative
    * window then runs over the DISTINCT-SCORE aggregate only — exact
    * ROC's irreducible serial tail. That aggregate is |distinct scores|
    * rows, which for calibrated model probabilities is far below the
    * data size but, unlike `bins`, UNBOUNDED in principle — at 100 TB
    * with near-continuous scores prefer [[binnedRoc]] (AUC error
    * O(1/bins)); this form exists for exact-artifact parity.
    *
    * Returns (threshold, fpr, tpr) ordered by descending threshold;
    * single-class input yields NULL rates, matching [[binnedRoc]]. */
  def exactRoc(df: DataFrame, scoreCol: String, labelCol: String)
      : DataFrame = {
    val byScore = df.select(col(scoreCol).cast("double").as("threshold"),
        col(labelCol).cast("long").as("y"))
      .groupBy(col("threshold"))
      .agg(sum(col("y")).as("pos"), (count(lit(1)) - sum(col("y"))).as("neg"))
    val w = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    byScore
      .withColumn("tp", sum(col("pos")).over(w))
      .withColumn("fp", sum(col("neg")).over(w))
      .withColumn("__p", sum(col("pos")).over(whole))
      .withColumn("__n", sum(col("neg")).over(whole))
      .select(col("threshold"),
        (col("fp").cast("double") /
          when(col("__n") > 0, col("__n"))).as("fpr"),
        (col("tp").cast("double") /
          when(col("__p") > 0, col("__p"))).as("tpr"))
      .orderBy(col("threshold").desc)
  }

  /** Exact trapezoidal AUC over [[exactRoc]] — equals sklearn's
    * `roc_auc_score` (the curve starts the integration at the implicit
    * (0,0) point via lag's default). NaN for single-class input, like
    * [[binnedAuc]]. */
  def exactAuc(df: DataFrame, scoreCol: String, labelCol: String): Double =
    trapezoid(exactRoc(df, scoreCol, labelCol), "threshold")
}
