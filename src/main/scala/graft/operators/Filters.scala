package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Null-safety filters.
  *
  * `df.na.drop()` compiles to a single `AtLeastNNonNulls(n_cols)`
  * predicate, which Catalyst does NOT decompose into per-column
  * `IsNotNull` filters — so nothing reaches the parquet scan and every
  * row is materialized before filtering (measured: Pushed Filters
  * empty, Post-Scan Filter atleastnnonnulls). At 100 TB that skips
  * row-group stats pruning entirely.
  *
  * `dropAnyNull` has identical semantics (drop rows with ANY null) but
  * emits an AND of IsNotNull predicates, all of which push into the
  * scan (footer stats + dictionary pruning apply).
  */
object Filters {

  def dropAnyNull(df: DataFrame): DataFrame =
    df.filter(df.columns.map(c => col(c).isNotNull).reduce(_ && _))

  def dropAnyNull(df: DataFrame, subset: Seq[String]): DataFrame =
    df.filter(subset.map(c => col(c).isNotNull).reduce(_ && _))
}
