package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension Type 2 (Kimball's warehouse pattern): turn a
  * timestamped attribute feed into versioned validity intervals —
  * (key, version, attr, valid_from, valid_to, is_current) — so any past
  * state is a range lookup, not a full replay. The reference pipeline is
  * stateless ETL (`/root/reference/preprocessing.py` has no dimension
  * maintenance at all); this is the standard mechanism a 100 TB
  * lakehouse uses to keep entity history queryable next to the facts
  * that [[Upsert.merge]] keeps current.
  *
  * Shape: change-detect with `lag` over (key | ts, tiebreak), keep rows
  * whose attribute differs null-safely from their predecessor, then
  * number versions and close intervals with `lead` over the SAME window
  * spec. Both window passes and the filter between them preserve the
  * (key-hash, sort) layout, so the whole history build is ONE Exchange +
  * one sort regardless of how many window steps stack (verified in the
  * plan: a single Exchange hashpartitioning(key)). Intervals are emitted
  * as unix MICROS (the EventQueries discipline — integer time compares
  * exactly on both engines).
  */
object Scd {

  /** Build the Type-2 history of `attr` per `keyCol`, ordered by
    * (`tsCol`, `tieCol`). A row opens an interval when its attribute
    * differs (null-safely) from the previous row's; `valid_to` is the
    * next change's timestamp, NULL while current. */
  def history(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, attr: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(keyCol), col(tsCol), col(tieCol), attr.as("attr"))
      .withColumn("prev", lag(col("attr"), 1).over(w))
      // lag(attr) is NULL both for "no predecessor" and "predecessor
      // held NULL" — indistinguishable, so a leading NULL attribute
      // would silently fail to open the key's first interval. lag(1)
      // over the SAME window is NULL exactly on the first row (same
      // Window operator, no extra Exchange) and disambiguates: the
      // first row always opens; later rows open on null-safe change,
      // so a NULL-to-NULL run still does not fabricate versions.
      .withColumn("opens", lag(lit(1), 1).over(w).isNull)
      .filter(col("opens") || !(col("prev") <=> col("attr")))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_from", unix_micros(col(tsCol)))
      .withColumn("valid_to", unix_micros(lead(col(tsCol), 1).over(w)))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col("version"), col("attr"),
        col("valid_from"), col("valid_to"), col("is_current"))
  }

  /** Point-in-time read: each key's state at `atMicros` (keys with no
    * interval open yet are absent — they did not exist then). At scale
    * this is the partition-prunable consumption path: a history table
    * written partitioned by is_current / bucketed by key serves "as of"
    * without touching the fact stream. */
  def snapshotAt(history: DataFrame, atMicros: Long): DataFrame =
    history.filter(col("valid_from") <= lit(atMicros) &&
      (col("valid_to").isNull || col("valid_to") > lit(atMicros)))
}
