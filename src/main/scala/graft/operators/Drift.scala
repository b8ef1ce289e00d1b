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

  /** Population Stability Index — the drift number production scorecards
    * actually report (credit-risk lineage; the bucketed complement to
    * the rank-based [[ksStatistic]]): with expected (slice `a`) and
    * actual (slice `b`) bucket proportions pᵉ, pᵃ,
    * PSI = Σ_buckets (pᵃ − pᵉ)·ln(pᵃ/pᵉ). Every term is ≥ 0 (the factors
    * share a sign), identical slices score exactly 0, and the usual
    * reading is <0.1 stable / 0.1–0.25 shifting / >0.25 drifted.
    *
    * Zero-count buckets (support present in only one slice) would make a
    * term infinite; the standard remedy, applied here, floors each
    * proportion at `floor` (default 1e-6) — deterministic on both
    * engines, and disjoint support then scores the maximal finite PSI
    * for the bucket count rather than blowing up.
    *
    * Cross-engine exactness: the per-bucket transcendental term rides
    * the 1e-9 quantize-then-integer-sum discipline (q_source_entropy /
    * q_unigram_nll) — one identically-associated IEEE double chain per
    * bucket, rounded onto an integer grid, summed order-free, divided
    * back once.
    *
    * Scale shape: the corpus reduces to a bucket-cardinality grid FIRST
    * (`bucketCol` must be a bucketed/quantized column — that is what the
    * P in PSI means); the only unpartitioned windows run over the GRID.
    * Returns one row: (n_a, n_b, n_buckets, psi rounded 6). */
  def psi(df: DataFrame, sliceCol: Column, bucketCol: Column,
      a: String, b: String, floor: Double = 1e-6): DataFrame = {
    require(floor > 0.0 && floor < 1.0,
      s"psi zero-bucket floor must be in (0,1), got $floor")
    import org.apache.spark.sql.expressions.Window
    val grid = df
      .filter(sliceCol.isin(a, b) && bucketCol.isNotNull)
      .select(sliceCol.as("s"), bucketCol.as("k"))
      .groupBy(col("k"))
      .agg(sum(when(col("s") === a, 1L).otherwise(0L)).as("da"),
        sum(when(col("s") === b, 1L).otherwise(0L)).as("db"))
    val wAll = Window.partitionBy()
    val pe = greatest(col("da").cast("double") / col("na").cast("double"),
      lit(floor))
    val pa = greatest(col("db").cast("double") / col("nb").cast("double"),
      lit(floor))
    grid
      .withColumn("na", sum(col("da")).over(wAll))
      .withColumn("nb", sum(col("db")).over(wAll))
      .withColumn("qt",
        round((pa - pe) * log(pa / pe) * lit(1e9)).cast("long"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        count(lit(1)).as("n_buckets"),
        round(sum(col("qt")).cast("double") / lit(1e9), 6).as("psi"))
  }

  /** The PSI monitoring form: per-partition PSI against the GLOBAL
    * bucket distribution — "which day's scorecard moved" as one frame,
    * the [[psi]] twin of [[ksByPartition]]. Expected = the global bucket
    * proportions, actual = the partition's; buckets a partition never
    * saw floor at `floor` (the dense union-support grid, partitions ×
    * buckets, same loud `maxCells` budget and same single-task-sort
    * rationale as the KS monitor). Returns (p, n_part, n_buckets, psi)
    * per partition, psi rounded 6. */
  def psiByPartition(df: DataFrame, partCol: Column, bucketCol: Column,
      floor: Double = 1e-6, maxCells: Long = 1000000L): DataFrame =
    psiByPartitionCounts(
      df.filter(partCol.isNotNull && bucketCol.isNotNull)
        .select(partCol.as("p"), bucketCol.as("k"))
        .groupBy(col("p"), col("k"))
        .agg(count(lit(1)).as("c")),
      floor, maxCells)

  /** [[psiByPartition]] from PRE-COUNTED (p, k, c) sufficient statistics
    * — the [[ksByPartitionCounts]] twin, and the entry point the
    * streaming monitor scores through. Duplicate (p, k) rows sum, so
    * any partial grid union is a valid input. */
  def psiByPartitionCounts(counts: DataFrame, floor: Double = 1e-6,
      maxCells: Long = 1000000L): DataFrame = {
    require(floor > 0.0 && floor < 1.0,
      s"psi zero-bucket floor must be in (0,1), got $floor")
    import org.apache.spark.sql.expressions.Window
    val grid = counts
      .filter(col("p").isNotNull && col("k").isNotNull)
      .groupBy(col("p"), col("k"))
      .agg(sum(col("c").cast("long")).as("c"))
      .localCheckpoint() // sized below, then consumed thrice
    val sizes = grid.agg(countDistinct(col("p")).as("np"),
      countDistinct(col("k")).as("nk")).head()
    val cells = sizes.getLong(0) * sizes.getLong(1)
    require(cells <= maxCells,
      s"psiByPartition: dense grid needs $cells cells " +
        s"(${sizes.getLong(0)} partitions x ${sizes.getLong(1)} buckets " +
        s"> budget $maxCells) — coarsen the bucket column or raise the " +
        "budget deliberately")
    val glob = grid.groupBy(col("k")).agg(sum(col("c")).as("g"))
    val parts = grid.select(col("p")).distinct()
    val dense = parts.crossJoin(glob)
      .join(grid, Seq("p", "k"), "left")
      .select(col("p"), col("k"), col("g"),
        coalesce(col("c"), lit(0L)).as("c"))
    val pe = greatest(col("g").cast("double") / col("ng").cast("double"),
      lit(floor))
    val pa = greatest(col("c").cast("double") / col("np").cast("double"),
      lit(floor))
    dense
      .withColumn("np", sum(col("c")).over(Window.partitionBy(col("p"))))
      .withColumn("ng", sum(col("c")).over(Window.partitionBy()))
      .withColumn("qt",
        round((pa - pe) * log(pa / pe) * lit(1e9)).cast("long"))
      .groupBy(col("p"))
      .agg(max(col("np")).as("n_part"),
        count(lit(1)).as("n_buckets"),
        round(sum(col("qt")).cast("double") / lit(1e9), 6).as("psi"))
  }

  /** The monitoring form: per-partition KS against the GLOBAL
    * distribution — "which day drifted" as one frame, no driver loop.
    * Returns (part, n_part, ks_d) per partition value.
    *
    * The ECDF gap must be evaluated on the UNION support (a partition's
    * step function holds constant through values it never saw, but the
    * global ECDF moves there), so the grid densifies to
    * partitions × |support| rows first — bounded by the VALUE DOMAIN
    * times the partition count, never the corpus, and guarded loudly
    * (`maxCells`) because a floating-point value column would make
    * |support| ≈ corpus and silently explode it. Cumulative sums then
    * ride two value-ordered windows (per-partition and global), both
    * over the dense GRID.
    *
    * The default budget is 10⁶ cells, deliberately conservative: the
    * global cumsum window (`wGlob`, and the `ng` total) is a SINGLE
    * unpartitioned sort task, so the budget bounds one task's sort —
    * 10⁸ cells there is minutes of single-thread wall and a spill risk,
    * not a safety margin. Raising it is a deliberate act: pass a bigger
    * `maxCells` only after deciding one task may own that sort, or
    * quantize the value column coarser instead (the intended path). */
  def ksByPartition(df: DataFrame, partCol: Column, valueCol: Column,
      maxCells: Long = 1000000L): DataFrame =
    ksByPartitionCounts(
      df.filter(partCol.isNotNull && valueCol.isNotNull)
        .select(partCol.as("p"), valueCol.as("v"))
        .groupBy(col("p"), col("v"))
        .agg(count(lit(1)).as("c")),
      maxCells)

  /** [[ksByPartition]] from PRE-COUNTED (p, v, c) sufficient statistics —
    * the entry point the streaming monitor scores through
    * ([[graft.streaming.EventStream.ksDaily]] maintains the count grid
    * as ordinary streaming-aggregation state and re-scores it per
    * micro-batch; KS is a global order statistic over the grid, so it
    * recomputes from the compacted statistics rather than living in a
    * state store). Duplicate (p, v) rows are summed, so any partial
    * grid union is a valid input. Same budget guard, same exact integer
    * arithmetic, same output as [[ksByPartition]]. */
  def ksByPartitionCounts(counts: DataFrame,
      maxCells: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def dec(c: Column) = c.cast("decimal(38,0)")
    val grid = counts
      .filter(col("p").isNotNull && col("v").isNotNull)
      .groupBy(col("p"), col("v"))
      .agg(sum(col("c").cast("long")).as("c"))
      .localCheckpoint() // sized below, then consumed twice (support/parts)
    val sizes = grid.agg(countDistinct(col("p")).as("np"),
      countDistinct(col("v")).as("nv")).head()
    val cells = sizes.getLong(0) * sizes.getLong(1)
    require(cells <= maxCells,
      s"ksByPartition: dense grid needs $cells cells " +
        s"(${sizes.getLong(0)} partitions x ${sizes.getLong(1)} distinct " +
        s"values > budget $maxCells) — quantize the value column to a " +
        "coarser grid or raise the budget deliberately")
    val support = grid.select(col("v")).distinct()
    val parts = grid.select(col("p")).distinct()
    val wPart = Window.partitionBy(col("p")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wGlob = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val globCum = grid.groupBy(col("v")).agg(sum(col("c")).as("g"))
      .withColumn("cg", sum(col("g")).over(wGlob))
    parts.crossJoin(support)
      .join(grid, Seq("p", "v"), "left")
      .withColumn("cd", sum(coalesce(col("c"), lit(0L))).over(wPart))
      .join(globCum.select(col("v"), col("cg")), Seq("v"))
      .withColumn("nd", sum(coalesce(col("c"), lit(0L)))
        .over(Window.partitionBy(col("p"))))
      .withColumn("ng", sum(coalesce(col("c"), lit(0L)))
        .over(Window.partitionBy()))
      .groupBy(col("p"))
      .agg(max(col("nd")).as("n_part"),
        max(abs(dec(col("cd")) * dec(col("ng")) -
          dec(col("cg")) * dec(col("nd")))).as("gmax"),
        max(col("ng")).as("ng"))
      .select(col("p"), col("n_part"),
        round(col("gmax").cast("double") /
          (col("n_part").cast("double") * col("ng").cast("double")), 6)
          .as("ks_d"))
  }
}
