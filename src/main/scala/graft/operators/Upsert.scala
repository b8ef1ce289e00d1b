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

  /** CDC apply: a change feed with an op column (`I`/`U`/`D`) folded
    * into the target — the MERGE form with a DELETE arm, i.e. the full
    * WHEN MATCHED UPDATE / WHEN MATCHED DELETE / WHEN NOT MATCHED
    * INSERT triple over immutable frames.
    *
    * Same one-anti-join shape as [[upsert]]: ALL change keys (including
    * deletes) anti-join the target once, then the non-delete rows union
    * back — deletes simply never return. The target shuffles once; the
    * change batch (bounded, CDC-sized) is the broadcast side.
    *
    * Contract, enforced loudly on cheap bounded probes:
    *  - ops must be exactly 'I'/'U'/'D' (a typo'd op silently treated
    *    as either insert or delete corrupts the table);
    *  - change keys must be unique across the WHOLE batch (same
    *    non-determinism as [[upsert]] — sequence the feed first);
    *  - an 'I' whose key already exists in the target is a feed error
    *    (the upstream lost track of liveness) and fails rather than
    *    silently degrading to an update.
    * 'U' on an absent key inserts (the convergent choice: a compacted /
    * replayed feed may carry U for rows the target never materialized);
    * 'D' on an absent key is a no-op (idempotent deletes — the standard
    * CDC replay contract).
    */
  def applyCdc(target: DataFrame, changes: DataFrame, keys: Seq[String],
      opCol: String = "op"): DataFrame = {
    require(keys.nonEmpty, "applyCdc needs at least one key column")
    val badOp = changes.filter(!col(opCol).isin("I", "U", "D"))
      .limit(1).count()
    require(badOp == 0L,
      s"applyCdc: op column '$opCol' contains values outside I/U/D")
    val dupKeys = changes.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).count()
    require(dupKeys == 0L,
      s"applyCdc: duplicate keys in the change batch on (${keys.mkString(", ")})" +
        " — sequence the feed to one change per key first")
    val insertOnLive = changes.filter(col(opCol) === "I")
      .join(target.select(keys.map(col): _*), keys, "left_semi")
      .limit(1).count()
    require(insertOnLive == 0L,
      "applyCdc: an 'I' change targets a key that already exists — " +
        "the feed lost track of liveness; emit 'U' (or fix the feed)")
    val upserts = changes.filter(col(opCol) =!= "D").drop(opCol)
    target.join(changes.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(upserts)
  }

  /** CDC feed GENERATION — the inverse of [[applyCdc]]: diff two full
    * snapshots of a keyed table into the minimal I/U/D change batch,
    * such that `applyCdc(old, snapshotDiff(old, new))` reproduces `new`
    * row-for-row (specced as a round trip). The production shape this
    * serves: an upstream that can only hand over full dumps still feeds
    * incremental consumers — the diff IS the change feed, and
    * downstream the whole [[applyCdc]]/SCD2/incremental-index machinery
    * applies unchanged.
    *
    * One full-outer join on the key. Non-key columns compare NULL-SAFELY
    * (`<=>`), so a null→value edit is an update, not a phantom match.
    * Unchanged rows emit NOTHING — minimality is the contract (a diff
    * that re-emits the table is a snapshot with extra steps). Output:
    * (`opCol`, keys..., new-side payload...); 'D' rows carry null
    * payload (the key is the tombstone).
    *
    * Contract: both snapshots key-unique (loud bounded probes, as
    * [[applyCdc]]) and same-schema. Scale shape: one key-partitioned
    * shuffle of each snapshot; output is delta-sized. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keys: Seq[String], opCol: String = "op"): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs at least one key column")
    require(oldSnap.columns.toSet == newSnap.columns.toSet,
      s"snapshotDiff: snapshot schemas differ — old has " +
        s"${oldSnap.columns.toSet -- newSnap.columns.toSet}, new has " +
        s"${newSnap.columns.toSet -- oldSnap.columns.toSet}")
    // reserved-name guard: a payload column named opCol would be
    // silently overwritten by withColumn, and the __o_/__in_ prefixes
    // are this operator's internal scratch space — collisions corrupt
    // the diff without error, so fail loudly (the module's discipline)
    val reserved = newSnap.columns.filter(c =>
      c == opCol || c.startsWith("__o_") || c == "__in_old" || c == "__in_new")
    require(reserved.isEmpty,
      s"snapshotDiff: snapshot columns ${reserved.mkString(", ")} collide " +
        s"with the output op column '$opCol' or the internal __o_/__in_ " +
        "prefixes — rename them or pass a different opCol")
    Seq("old" -> oldSnap, "new" -> newSnap).foreach { case (side, df) =>
      val dup = df.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).count()
      require(dup == 0L,
        s"snapshotDiff: duplicate keys in the $side snapshot on " +
          s"(${keys.mkString(", ")}) — a keyed diff needs key-unique sides")
    }
    val payload = newSnap.columns.filterNot(keys.contains).toSeq
    val l = oldSnap.select(
      (keys.map(col) :+ lit(true).as("__in_old")) ++
        payload.map(c => col(c).as(s"__o_$c")): _*)
    val r = newSnap.withColumn("__in_new", lit(true))
    val changed = payload.map(c => !(col(c) <=> col(s"__o_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    l.join(r, keys, "full_outer")
      .withColumn(opCol,
        when(col("__in_old").isNull, "I")
          .when(col("__in_new").isNull, "D")
          .when(changed, "U"))
      .filter(col(opCol).isNotNull) // unchanged rows emit nothing
      .select(col(opCol) +: (keys.map(col) ++ payload.map(col)): _*)
  }
}
