package graft

import org.apache.spark.sql.functions._
import graft.operators.Upsert

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private val target = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
    .toDF("k", "name", "v")

  test("matched rows replaced, new keys inserted, rest carried over") {
    val updates = Seq((2L, "B", 99), (9L, "z", 1)).toDF("k", "name", "v")
    val out = Upsert.upsert(target, updates, Seq("k"))
      .orderBy("k").as[(Long, String, Int)].collect().toSeq
    assert(out == Seq((1L, "a", 10), (2L, "B", 99), (3L, "c", 30),
      (9L, "z", 1)))
  }

  test("duplicate update keys fail loudly (MERGE determinism contract)") {
    val dup = Seq((2L, "B", 1), (2L, "C", 2)).toDF("k", "name", "v")
    val e = intercept[IllegalArgumentException] {
      Upsert.upsert(target, dup, Seq("k")).count()
    }
    assert(e.getMessage.contains("duplicate keys"))
  }

  test("compound keys") {
    val t = Seq((1L, "x", 1), (1L, "y", 2)).toDF("k1", "k2", "v")
    val u = Seq((1L, "y", 9)).toDF("k1", "k2", "v")
    val out = Upsert.upsert(t, u, Seq("k1", "k2"))
      .orderBy("k1", "k2").as[(Long, String, Int)].collect().toSeq
    assert(out == Seq((1L, "x", 1), (1L, "y", 9)))
  }

  test("applyCdc: U replaces, D removes, I inserts, U-on-absent inserts") {
    val changes = Seq(
      (2L, "B", 99, "U"),  // matched update
      (3L, "", 0, "D"),    // matched delete
      (7L, "g", 7, "I"),   // fresh insert
      (8L, "h", 8, "U"),   // U on absent key -> converges to insert
      (9L, "", 0, "D")     // D on absent key -> idempotent no-op
    ).toDF("k", "name", "v", "op")
    val out = Upsert.applyCdc(target, changes, Seq("k"))
      .orderBy("k").as[(Long, String, Int)].collect().toSeq
    assert(out == Seq((1L, "a", 10), (2L, "B", 99), (7L, "g", 7),
      (8L, "h", 8)))
  }

  test("applyCdc loud guards: bad op, duplicate keys, insert-on-live") {
    val badOp = Seq((2L, "B", 1, "X")).toDF("k", "name", "v", "op")
    assert(intercept[IllegalArgumentException] {
      Upsert.applyCdc(target, badOp, Seq("k")).count()
    }.getMessage.contains("outside I/U/D"))
    val dup = Seq((2L, "B", 1, "U"), (2L, "", 0, "D"))
      .toDF("k", "name", "v", "op")
    assert(intercept[IllegalArgumentException] {
      Upsert.applyCdc(target, dup, Seq("k")).count()
    }.getMessage.contains("duplicate keys"))
    val liveInsert = Seq((2L, "B", 1, "I")).toDF("k", "name", "v", "op")
    assert(intercept[IllegalArgumentException] {
      Upsert.applyCdc(target, liveInsert, Seq("k")).count()
    }.getMessage.contains("already exists"))
  }

  test("snapshotDiff emits the minimal I/U/D batch; applyCdc round-trips") {
    val old = Seq((1L, Option("a"), 10.0), (2L, None, 20.0),
      (3L, Option("c"), 30.0), (4L, Option("d"), 40.0))
      .toDF("k", "s", "v")
    // 1 unchanged, 2 null->value update, 3 deleted, 4 value update,
    // 5 inserted
    val neu = Seq((1L, Option("a"), 10.0), (2L, Option("b"), 20.0),
      (4L, Option("d"), 41.0), (5L, Option("e"), 50.0))
      .toDF("k", "s", "v")
    val diff = Upsert.snapshotDiff(old, neu, Seq("k"))
    val got = diff.as[(String, Long, Option[String], Option[Double])]
      .collect().toSet
    assert(got === Set(("U", 2L, Some("b"), Some(20.0)),
      ("D", 3L, None, None), ("U", 4L, Some("d"), Some(41.0)),
      ("I", 5L, Some("e"), Some(50.0))),
      "minimal batch: unchanged row 1 must emit nothing")
    // the round trip: applying the diff to old reproduces new exactly
    val applied = Upsert.applyCdc(old, diff, Seq("k"))
      .as[(Long, Option[String], Double)].collect().toSet
    assert(applied === neu.as[(Long, Option[String], Double)].collect().toSet)
    // identical snapshots diff to nothing
    assert(Upsert.snapshotDiff(old, old, Seq("k")).count() === 0L)
  }

  test("snapshotDiff guards: schema mismatch and duplicate keys are loud") {
    val a = Seq((1L, 1.0)).toDF("k", "v")
    val e1 = intercept[IllegalArgumentException] {
      Upsert.snapshotDiff(a, Seq((1L, "x")).toDF("k", "s"), Seq("k"))
    }
    assert(e1.getMessage.contains("schemas differ"))
    val dup = Seq((1L, 1.0), (1L, 2.0)).toDF("k", "v")
    val e2 = intercept[IllegalArgumentException] {
      Upsert.snapshotDiff(a, dup, Seq("k"))
    }
    assert(e2.getMessage.contains("duplicate keys"))
  }
}
