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
}
