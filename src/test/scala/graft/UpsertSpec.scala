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
}
