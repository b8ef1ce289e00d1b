package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupGroups

class DedupGroupsSpec extends SparkSpec {
  import spark.implicits._

  private def ids(xs: Long*) = xs.toDF("id")
  private def pairs(ps: (Long, Long)*) = ps.toDF("id_a", "id_b")

  test("transitive chains collapse to one component; singletons stay put") {
    // 1-2, 2-3 chain (1~3 never paired) + 5-6 + singleton 9
    val comps = DedupGroups.connectedComponents(
        ids(1, 2, 3, 5, 6, 9), "id", pairs((1L, 2L), (2L, 3L), (5L, 6L)))
      .as[(Long, Long)].collect().toMap
    assert(comps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 5L, 6L -> 5L, 9L -> 9L))
  }

  test("long chain converges (diameter > 2) and labels with the min id") {
    val chain = (1L until 10L).map(i => (i, i + 1))
    val comps = DedupGroups.connectedComponents(
        ids((1L to 10L): _*), "id", pairs(chain: _*))
      .as[(Long, Long)].collect().toMap
    assert(comps.values.toSet === Set(1L))
  }

  test("resolve keeps exactly one survivor per group and is idempotent") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (5L, "d"), (9L, "e"))
      .toDF("id", "payload")
    val p = pairs((1L, 2L), (2L, 3L))
    val once = DedupGroups.resolve(df, "id", p)
    assert(once.select($"id").as[Long].collect().toSet === Set(1L, 5L, 9L))
    // survivors carry their payload untouched
    assert(once.filter($"id" === 1L).select($"payload").head().getString(0) === "a")
    // resolving an already-resolved frame changes nothing (no pairs survive)
    val twice = DedupGroups.resolve(once, "id",
      p.join(once.select($"id".as("id_a")), Seq("id_a"), "left_semi")
        .join(once.select($"id".as("id_b")), Seq("id_b"), "left_semi"))
    assert(twice.count() === once.count())
  }

  test("empty pair set leaves every row its own component") {
    val comps = DedupGroups.connectedComponents(
        ids(1, 2, 3), "id", pairs())
      .as[(Long, Long)].collect().toMap
    assert(comps === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("driver fast path and distributed loop agree") {
    // ring + chain + singletons: exercises pointer jumping AND union-find
    val ps = pairs((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L),
      (12L, 13L), (20L, 21L))
    val universe = ids((1L to 3L) ++ (10L to 13L) ++ Seq(20L, 21L, 30L): _*)
    val fast = DedupGroups.connectedComponents(universe, "id", ps)
      .as[(Long, Long)].collect().toMap
    val dist = DedupGroups.connectedComponents(universe, "id", ps,
        collectThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(fast === dist)
    assert(fast(3L) === 1L && fast(13L) === 10L && fast(21L) === 20L
      && fast(30L) === 30L)
  }

  test("resolve ignores pairs that reference ids absent from the frame") {
    // pair (0, 1) links df row 1 to foreign id 0: without the guard the
    // component min would be 0 and row 1 would be dropped with no
    // survivor kept.
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "payload")
    val kept = DedupGroups.resolve(df, "id", pairs((0L, 1L)))
      .select($"id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L))
  }

  test("string ids resolve components on the driver path") {
    val comps = DedupGroups.connectedComponents(
        Seq("a", "b", "c", "z").toDF("id"), "id",
        Seq(("b", "c"), ("c", "a")).toDF("id_a", "id_b"))
      .as[(String, String)].collect().toMap
    assert(comps === Map("a" -> "a", "b" -> "a", "c" -> "a", "z" -> "z"))
  }
}
