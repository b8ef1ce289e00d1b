package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE exact-integer-cents discipline, in one place.
  *
  * Double money/value sums are accumulation-order-dependent; converting
  * each amount to integer cents, summing longs exactly, and dividing
  * once at the end makes the result bit-identical across partitionings
  * and engines (SURVEY §2.4 / the oracle rules).
  *
  * Rounding mode is Spark's `round(x, 0)` = HALF_UP (half away from
  * zero: −12.5 cents → −13). Every conversion site must share it — a
  * `math.round` variant (half toward +∞: −12.5 → −12) silently drifts
  * one cent on negative half-cent amounts, which is why the scalar form
  * here wraps BigDecimal HALF_UP rather than math.round.
  */
object Money {

  /** Magnitude bound for representable amounts: |v| at or beyond this
    * cannot express its cents in a long (Long.MaxValue/100 ≈ 9.2e16,
    * held back to 9e16 to stay clear of double-rounding at the edge).
    * Values beyond it are corrupt by definition — no monetary column
    * holds 90 quadrillion — and contribute 0 like NaN/Infinity. */
  val MaxAbs: Double = 9.0e16

  /** Exact integer cents of a double column (HALF_UP). NaN, ±Infinity
    * and finite values beyond [[MaxAbs]] contribute 0, matching
    * [[centsOf]]: Spark's round() passes them through, and the long
    * cast then throws under Spark 4's default ANSI mode (non-ANSI:
    * saturates to Long.MaxValue) — either way batch and streaming
    * totals would diverge on corrupt values without the guard. */
  def cents(c: Column): Column = {
    val d = c.cast("double")
    when(isnan(d) || abs(d) >= MaxAbs, 0L)
      .otherwise(round(d * 100, 0).cast("long"))
  }

  /** Exact cents total rendered back to a 2dp double. */
  def centsTotal(c: Column): Column =
    sum(cents(c)).cast("double") / 100.0

  /** DuckDB mirror of [[cents]] (duckdb round() is also half-away). */
  def centsSql(e: String): String = s"CAST(round($e * 100) AS BIGINT)"

  /** Scalar mirror of [[cents]] for typed aggregators / mapGroups code.
    * NOT math.round (half toward +∞) — see the class doc. NaN/Infinity
    * and beyond-[[MaxAbs]] values contribute 0, same guard as the
    * Column form — a corrupt value must never kill a 24/7 streaming
    * query from inside a stateful operator (BigDecimal(NaN) throws,
    * BigDecimal.toLong silently wraps on overflow). */
  def centsOf(v: Double): Long =
    if (v.isNaN || math.abs(v) >= MaxAbs) 0L
    else BigDecimal(v * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
}
