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
}
