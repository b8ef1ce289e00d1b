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
}
