package graft

import graft.operators.GraphMetrics

class GraphMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("two triangles + bridge + isolated node: counts and coefficients") {
    val nodes = (0L to 6L).toDF("id")
    val pairs = Seq(
      (0L, 1L), (1L, 2L), (0L, 2L), // triangle A
      (3L, 4L), (4L, 5L), (3L, 5L), // triangle B
      (2L, 3L)                      // bridge (no new triangle)
    ).toDF("id_a", "id_b")
    val got = GraphMetrics.triangleStats(nodes, "id", pairs)
      .orderBy("id").as[(Long, Long, Double)].collect().toSeq
    // deg-2 triangle members: 1 triangle, coeff 2·1/(2·1)=1.0;
    // bridge endpoints (deg 3): 1 triangle, coeff 2·1/(3·2)=0.333333;
    // isolated node: zeros
    assert(got == Seq(
      (0L, 1L, 1.0), (1L, 1L, 1.0), (2L, 1L, 0.333333),
      (3L, 1L, 0.333333), (4L, 1L, 1.0), (5L, 1L, 1.0),
      (6L, 0L, 0.0)))
  }

  test("k-core peel cascades (a chain peels one node per round) and reaches a fixpoint") {
    // triangle 0-1-2 with a pendant chain 2-3-4-5: the 2-core is exactly
    // the triangle, but node 3 only drops AFTER 5 then 4 drop — a
    // single-round degree filter would keep 3 and 4 wrongly.
    val nodes = (0L to 5L).toDF("id")
    val pairs = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L), (3L, 4L),
      (4L, 5L)).toDF("id_a", "id_b")
    val got = GraphMetrics.kCore(nodes, "id", pairs, k = 2)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L), (1L, 1L), (2L, 1L), (3L, 0L), (4L, 0L),
      (5L, 0L)))
    // fixpoint: one more round changes nothing
    val more = GraphMetrics.kCore(nodes, "id", pairs, k = 2, rounds = 11)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(more == got)
  }

  test("each triangle counted exactly once (orientation, no distinct pass)") {
    // K4: 4 triangles, every node in 3 of them, deg 3 → coeff 1.0
    val nodes = (0L to 3L).toDF("id")
    val pairs = (for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j))
      .toDF("id_a", "id_b")
    val got = GraphMetrics.triangleStats(nodes, "id", pairs)
      .orderBy("id").as[(Long, Long, Double)].collect().toSeq
    assert(got.forall { case (_, t, c) => t == 3L && c == 1.0 })
  }
}
