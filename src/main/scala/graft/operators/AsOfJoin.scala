package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark's DataFrame API lacks
  * (SURVEY.md §4: compose built-ins before writing a custom
  * LogicalPlan). For each left row, attach the payload of the LATEST
  * right row with the same key and right.ts <= left.ts.
  *
  * Implementation is the union trick: tag both sides, sort per key by
  * (ts, side) with right rows first on ties (<= semantics), and carry
  * the last non-null right payload forward with a running last(...,
  * ignoreNulls). ONE shuffle on the key, per-key sort only — the same
  * cost as a sort-merge join, with none of the range-join blowup a
  * naive `left.ts >= right.ts` theta-join would produce (Spark plans
  * those as broadcast-nested-loop: O(n·m) at 100 TB).
  *
  * Right-side (key, ts) duplicates must be pre-deduped by the caller if
  * a deterministic winner is required (see q_asof_join: max payload per
  * key+ts), matching DuckDB ASOF JOIN's unique-match expectation.
  *
  * NULL semantics match SQL ASOF: a NULL key or NULL timestamp never
  * matches anything. Without the explicit guards, Window.partitionBy
  * would group NULL keys together and NULLS-FIRST ordering would sort a
  * NULL right ts before every real row, seeding its payload into every
  * earlier left row.
  */
object AsOfJoin {

  /** @param payload right-side columns to attach (must not collide with
    *                left column names).
    * @param toleranceUs optional staleness bound (micros): a match older
    *                than `leftTs - toleranceUs` is rejected — the
    *                `merge_asof(tolerance=...)` semantics. Same ONE
    *                shuffle: the carried struct also carries the
    *                matched right timestamp, and the bound is a
    *                row-local filter AFTER the fill (never a range
    *                join). */
  def asof(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTs: String, rightTs: String,
      payload: Seq[String], toleranceUs: Option[Long] = None): DataFrame = {
    require(!payload.contains("__rts"), "__rts is reserved")
    // a negative bound rejects EVERY match (the staleness diff is
    // always >= 0) — that is a sign slip at the call site, not a
    // query; fail loudly like merge_asof does
    require(toleranceUs.forall(_ >= 0),
      s"toleranceUs must be >= 0, got ${toleranceUs.get}")
    // the tolerance path reads both ts columns through unix_micros, so
    // it requires TIMESTAMP-typed columns (a DATE rightTs fails at
    // analysis); the unbounded path has no such constraint
    val carryRts = toleranceUs.isDefined
    val leftCols = left.columns.toSeq
    // The payload rides as ONE struct so last(ignoreNulls) picks the
    // entire latest right ROW: a NULL field inside the newest matching
    // row stays NULL (DuckDB ASOF semantics) instead of falling back to
    // a stale older value, and fields can never be stitched together
    // from different right rows. Under a tolerance bound the struct
    // additionally carries the right row's timestamp (`__rts`) so the
    // bound can reject stale matches row-locally; unbounded callers
    // don't pay the extra carried field, and it is stripped from the
    // output either way.
    val payloadStructType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(p).copy(name = p)) ++
        (if (carryRts) Seq(right.schema(rightTs).copy(name = "__rts"))
         else Seq.empty))
    val lTagged = left
      .withColumn("__k", col(leftKey))
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(Seq(col("__k"), col("__ts"), col("__side")) ++
        leftCols.map(col) :+
        lit(null).cast(payloadStructType).as("__p"): _*)
    val rTagged = right
      // NULL-key / NULL-ts right rows can never be "the latest match";
      // dropping them up front keeps them out of the carry-forward.
      .filter(col(rightKey).isNotNull && col(rightTs).isNotNull)
      .withColumn("__k", col(rightKey))
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(Seq(col("__k"), col("__ts"), col("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col) ++
          (if (carryRts) Seq(col(rightTs).as("__rts")) else Seq.empty): _*)
          .as("__p"): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lTagged.unionByName(rTagged)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val bounded = toleranceUs.fold(filled) { tol =>
      filled.withColumn("__p",
        when(unix_micros(col("__ts")) -
          unix_micros(col("__p").getField("__rts")) <= tol, col("__p")))
    }
    bounded.select(leftCols.map(col) ++
      payload.map(p => col("__p").getField(p).as(p)): _*)
  }
}
