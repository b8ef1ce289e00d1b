package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling: per-column null counts, exact distinct
  * counts, and min/max — the data-quality report run before committing a
  * corpus snapshot.
  *
  * All metrics come from ONE aggregation job (Spark plans the multiple
  * DISTINCT aggregates via Expand — logically one pass over the data),
  * then pivot to a long (column, metric...) frame driver-side-free via
  * explode. min/max are cast to string so heterogeneous column types
  * share one schema; string ordering is binary (memcmp) in both Spark
  * and DuckDB, keeping the oracle exact.
  *
  * For routine monitoring at 100 TB swap `countDistinct` for
  * `approx_count_distinct` (no Expand blowup); the exact form is the
  * audit/oracle path.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__${c}__nulls"),
        countDistinct(col(c)).as(s"__${c}__distinct"),
        min(col(c)).cast("string").as(s"__${c}__min"),
        max(col(c)).cast("string").as(s"__${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val metrics = array(cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__${c}__nulls").as("n_nulls"),
        col(s"__${c}__distinct").as("n_distinct"),
        col(s"__${c}__min").as("min_value"),
        col(s"__${c}__max").as("max_value"))
    }: _*)
    row.select(col("__n").as("n_rows"), explode(metrics).as("m"))
      .select(col("m.column"), col("n_rows"), col("m.n_nulls"),
        col("m.n_distinct"), col("m.min_value"), col("m.max_value"))
  }

  /** Binned text-length histogram (the `preprocessing.py:78,137` chart
    * input, computed in-engine instead of sampling to pandas): ONE hash
    * aggregation to ≤ clampLen/binWidth + 1 rows at any corpus size —
    * lengths clamp into the last bin so a single outlier document can't
    * blow up the bin count. Null text is EXCLUDED (Spark's `least` skips
    * nulls, which would otherwise count null rows as clamp-length
    * documents). Oracle-checked as `q_length_histogram`. */
  def lengthHistogram(df: DataFrame, textCol: String = "text",
      binWidth: Int = 5, clampLen: Int = 300): DataFrame =
    df.where(col(textCol).isNotNull)
      .select(least(length(col(textCol)), lit(clampLen)).cast("int").as("len"))
      .groupBy((floor(col("len") / binWidth).cast("int") * binWidth)
        .as("bin_start"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bin_start"))

  /** Five-number text-length summary (`preprocessing.py:73,131`'s
    * boxplot input) — ONE aggregation row, quartiles via
    * percentile_approx (the sketch; exact quartiles would sort the
    * corpus). Empty input yields one all-null row (Spark global-agg
    * semantics) — callers collecting it must check. */
  def lengthSummary(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(length(col(textCol)).cast("double").as("len"))
      .agg(min(col("len")).as("min"),
        percentile_approx(col("len"), lit(0.25), lit(10000)).as("q1"),
        percentile_approx(col("len"), lit(0.5), lit(10000)).as("median"),
        percentile_approx(col("len"), lit(0.75), lit(10000)).as("q3"),
        max(col("len")).as("max"))
}
