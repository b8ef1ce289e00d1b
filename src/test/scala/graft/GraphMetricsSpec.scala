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

  test("under-sized rounds fail loudly instead of silently under-peeling") {
    // the chain fixture needs 3 peel rounds + 1 confirming round; a
    // 3-round budget cannot CONFIRM the fixpoint and must throw (the
    // identically-unrolled mirror would have been equally wrong — the
    // one failure class the oracle can't catch)
    val nodes = (0L to 5L).toDF("id")
    val pairs = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L), (3L, 4L),
      (4L, 5L)).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      GraphMetrics.kCore(nodes, "id", pairs, k = 2, rounds = 3).count()
    }
    assert(e.getMessage.contains("fixpoint"))
    // one more round confirms and succeeds
    val got = GraphMetrics.kCore(nodes, "id", pairs, k = 2, rounds = 4)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 1L, 1L, 0L, 0L, 0L))
  }

  test("k-core driver path == distributed path (KCorePathSpec contract)") {
    // maxDriverEdges=0 forces the distributed loop; default takes the
    // driver peel — both must produce the identical membership on the
    // chain fixture and on randomized graphs (isolated nodes included:
    // the two paths initialize alive differently but share the fixpoint)
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val edge = for {
      a <- Gen.choose(0L, 24L); b <- Gen.choose(0L, 24L) if a != b
    } yield (math.min(a, b), math.max(a, b))
    for (seed <- 1L to 3L; k <- Seq(2, 3)) {
      val es = sample(Gen.listOfN(50, edge), seed * 7 + k).distinct
      val n = (0L to 30L).toDF("id") // ids 25..30 isolated
      val p = es.toDF("id_a", "id_b")
      // rounds >= node count: a random sparse graph's cascade can be
      // deeper than the default-10 budget (both paths would throw the
      // same under-peel guard; here we compare the converged answers)
      val local = GraphMetrics.kCore(n, "id", p, k, rounds = 31)
        .orderBy("id").as[(Long, Long)].collect().toSeq
      val dist = GraphMetrics.kCore(n, "id", p, k, rounds = 31,
          maxDriverEdges = 0L)
        .orderBy("id").as[(Long, Long)].collect().toSeq
      assert(local == dist, s"seed=$seed k=$k")
    }
  }

  test("degree orientation == id orientation (same triangle set), hub-safe") {
    // Star K1,50 + one triangle hanging off the hub: id orientation gives
    // the hub (id 0) a quadratic out-wedge set; degree orientation points
    // every spoke edge AT the hub (spokes have deg 1 < hub) so the hub's
    // out-degree is ~2. Results must be identical.
    val nodes = (0L to 51L).toDF("id")
    val star = (1L to 50L).map(i => (0L, i))
    val pairs = (star ++ Seq((1L, 51L), (0L, 51L))).toDF("id_a", "id_b")
    val byId = GraphMetrics.triangleStats(nodes, "id", pairs)
      .orderBy("id").as[(Long, Long, Double)].collect().toSeq
    val byDeg = GraphMetrics.triangleStatsByDegree(nodes, "id", pairs)
      .orderBy("id").as[(Long, Long, Double)].collect().toSeq
    assert(byDeg == byId)
    assert(byId.head._2 == 1L) // hub is in exactly the one triangle
    // randomized graphs: any total order counts each triangle once
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val edge = for {
      a <- Gen.choose(0L, 19L); b <- Gen.choose(0L, 19L) if a != b
    } yield (math.min(a, b), math.max(a, b))
    for (seed <- 1L to 3L) {
      val es = sample(Gen.listOfN(60, edge), seed).distinct
      val n = (0L to 19L).toDF("id")
      val p = es.toDF("id_a", "id_b")
      val a = GraphMetrics.triangleStats(n, "id", p)
        .orderBy("id").as[(Long, Long, Double)].collect().toSeq
      val b = GraphMetrics.triangleStatsByDegree(n, "id", p)
        .orderBy("id").as[(Long, Long, Double)].collect().toSeq
      assert(a == b, s"seed=$seed")
    }
  }
}
