package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-flight join diagnostics: the EXACT output cardinality of an inner
  * equi-join — total and per-key — computed WITHOUT running the join.
  *
  * The 100 TB failure mode this exists for: an equi-join output is
  * Σ_k nₗ(k)·nᵣ(k), quadratic in any shared hot key's multiplicity — a
  * "join on part" that looks linear at sf0.01 can be petabyte-sized in
  * production, and by the time the shuffle spills it has already burned
  * the cluster ([[Salting]] fixes reducer skew, but nothing fixes an
  * output that is simply too large; [[FuzzyJoin]]'s gram blocking hit
  * exactly this Σdf² wall before routing hot prefixes to FastSS). The
  * diagnosis costs two wordcount-shaped aggregates and one
  * vocabulary-sized join of the HISTOGRAMS — never the data: run it
  * first, then decide (filter the hot keys, switch blocking, salt, or
  * accept).
  *
  * All counts are exact integers — cross-engine reproducible, and the
  * per-key table doubles as the skew report (which keys explode).
  */
object JoinDiagnostics {

  /** Per-key join cardinality: (keys..., n_left, n_right, n_pairs) for
    * every key present on BOTH sides — n_pairs = n_left·n_right is
    * exactly the inner-join output for that key. Self-joins: pass the
    * same frame twice; n_pairs then counts ORDERED pairs including
    * self-matches (k·k per key) — the `a.id < b.id` candidate form is
    * (Σk² − Σk)/2, derivable from this table, stated here so nobody
    * halves the wrong thing.
    *
    * `n_pairs` is decimal(38,0), NOT long: this module exists to catch
    * petabyte-output joins, and two 10⁹-row hot keys already put
    * n_left·n_right past Long.MaxValue — a wrapped (negative) product
    * would make [[requireBounded]] pass silently at exactly the scale it
    * guards. decimal(19,0)·decimal(19,0) → decimal(38,0) holds any
    * product of realistic counts exactly (the [[Drift]] ECDF-numerator
    * discipline). */
  def joinCardinality(left: DataFrame, right: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "joinCardinality needs at least one key column")
    val l = left.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_left"))
    val r = right.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_right"))
    l.join(r, keys)
      .select(keys.map(col) :+ col("n_left") :+ col("n_right") :+
        (col("n_left").cast("decimal(19,0)") *
          col("n_right").cast("decimal(19,0)"))
          .cast("decimal(38,0)").as("n_pairs"): _*)
  }

  /** Exact inner-join output rows, as one number (the per-key table
    * reduced). Aggregate-sized collect — safe at any scale; the total
    * stays decimal(38,0) end-to-end so it cannot wrap either. */
  def outputRows(left: DataFrame, right: DataFrame,
      keys: Seq[String]): BigDecimal = {
    val v = joinCardinality(left, right, keys)
      .agg(coalesce(sum(col("n_pairs")),
        lit(0).cast("decimal(38,0)")).as("total"))
      .head().getDecimal(0)
    BigDecimal(v)
  }

  /** The loud guard: fail BEFORE a join whose exact output exceeds
    * `maxRows`, naming the worst key — the [[FuzzyJoin]] maxCellRows /
    * [[SemDedup]] maxCellRows discipline applied to arbitrary equi-joins.
    * Returns the exact output size for logging on the pass path. */
  def requireBounded(left: DataFrame, right: DataFrame, keys: Seq[String],
      maxRows: Long): BigDecimal = {
    val agg = joinCardinality(left, right, keys)
      .agg(coalesce(sum(col("n_pairs")),
          lit(0).cast("decimal(38,0)")).as("total"),
        max(col("n_pairs")).as("worst"))
      .head()
    // decimal end-to-end: a long total would wrap negative in exactly
    // the petabyte-output regime this guard exists for, and a wrapped
    // total "passes" the budget silently
    val total = BigDecimal(agg.getDecimal(0))
    require(total <= BigDecimal(maxRows),
      s"join on (${keys.mkString(", ")}) would produce $total rows " +
        s"(> budget $maxRows; worst single key contributes " +
        s"${Option(agg.getDecimal(1)).map(BigDecimal(_)).getOrElse(BigDecimal(0))}) — " +
        "filter the hot keys, block differently, " +
        "or raise the budget deliberately")
    total
  }
}
