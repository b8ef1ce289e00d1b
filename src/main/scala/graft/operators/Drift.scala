package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection: the two-sample Kolmogorov–Smirnov
  * statistic D = max_v |F̂₁(v) − F̂₂(v)| — the standard screen for "did
  * this feed's value distribution shift" (train/serve skew, a broken
  * upstream, a new client version), run between two slices of the same
  * column.
  *
  * EXACT, no floats until the final report: with counts c₁(v), c₂(v)
  * and totals n₁, n₂, the ECDF gap at v is |C₁(v)·n₂ − C₂(v)·n₁| /
  * (n₁·n₂) — numerator and argmax computed entirely on integers
  * (decimal-38 products: C·n wraps a long near 10⁹×10⁹ rows), one
  * division at the end. Ties in the gap resolve to the SMALLEST value
  * (deterministic, both engines).
  *
  * Scale shape: the raw rows reduce to a per-(slice, value) count grid
  * FIRST — the grid is value-cardinality-sized (bounded by the value
  * domain, not the corpus), so the single unpartitioned cumulative
  * window that follows sorts the GRID, never the data (the
  * q_source_entropy cell-table discipline). For unbounded-domain
  * doubles, quantize to a grid (cents, micros) upstream — which this
  * library's money/time discipline does anyway.
  */
object Drift {

  /** One-row KS report between slice `a` and slice `b` of `valueCol`
    * (already on an integer grid): (n_a, n_b, ks_d rounded 6, ks_at =
    * the smallest value attaining the max gap). */
  def ksStatistic(df: DataFrame, sliceCol: Column, valueCol: Column,
      a: String, b: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def dec(c: Column) = c.cast("decimal(38,0)")
    val grid = df
      .filter(sliceCol.isin(a, b) && valueCol.isNotNull)
      .select(sliceCol.as("s"), valueCol.as("v"))
      .groupBy(col("v"))
      .agg(sum(when(col("s") === a, 1L).otherwise(0L)).as("da"),
        sum(when(col("s") === b, 1L).otherwise(0L)).as("db"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("ca", sum(col("da")).over(w))
      .withColumn("cb", sum(col("db")).over(w))
      .withColumn("na", sum(col("da")).over(Window.partitionBy()))
      .withColumn("nb", sum(col("db")).over(Window.partitionBy()))
      .withColumn("gap",
        abs(dec(col("ca")) * dec(col("nb")) - dec(col("cb")) * dec(col("na"))))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        max(col("gap")).as("gmax"),
        max_by(col("v"), struct(col("gap"), -col("v"))).as("ks_at"))
      .select(col("n_a"), col("n_b"),
        round(col("gmax").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6)
          .as("ks_d"),
        col("ks_at"))
  }
}
