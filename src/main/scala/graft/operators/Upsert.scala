package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO semantics over immutable frames — the Spark-native rewrite
  * (no table format required): update rows WIN on key match (WHEN
  * MATCHED THEN UPDATE as whole-row replace), unmatched update rows
  * INSERT, unmatched target rows carry over unchanged.
  *
  * Shape: ONE left-anti join of the target against the update keys, then
  * a union — the target is never shuffled twice and never joined
  * row-to-row with the updates (a full-outer MERGE rewrite would move
  * both sides; the anti form moves only keys). At 100 TB the update side
  * of a merge is typically bounded (a CDC batch) — Spark broadcasts the
  * anti join's key side automatically under the threshold, and the
  * output can be written back partition-aligned with the target.
  *
  * Contract: `updates` must be key-unique (a MERGE with duplicate
  * source keys is non-deterministic in every engine; SQL MERGE raises —
  * so does this, with a loud require on a cheap grouped probe).
  */
object Upsert {

  def upsert(target: DataFrame, updates: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val dupKeys = updates.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).count()
    require(dupKeys == 0L,
      s"upsert: duplicate keys in the update side on (${keys.mkString(", ")})" +
        " — MERGE with a non-key-unique source is non-deterministic; " +
        "dedupe the updates first (e.g. Dedup.exact / latest-wins)")
    updates.unionByName(
      target.join(updates.select(keys.map(col): _*), keys, "left_anti"))
  }
}
