package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohesion metrics over an undirected pair graph: per-node triangle
  * counts and the local clustering coefficient — the standard QA signal
  * for duplicate clusters (a clique-like component is one entity; a
  * star-like one is a hub string chaining unrelated near-misses, the
  * thing an anchor-wins prune should NOT collapse).
  *
  * Shape: the classic oriented-wedge join, in two orientations that
  * produce the IDENTICAL triangle set (specced equal):
  *
  *  - [[triangleStats]] orients low-id → high-id (the input contract,
  *    `id_a < id_b`): every triangle {u < v < w} is counted exactly once
  *    as the wedge (u,v)+(v,w) closed by (u,w). Trivial to mirror in
  *    SQL — it IS the oracle form — but the wedge count is Σ deg⁺(v)²
  *    over id-order out-degrees, so a hub node with high id-order
  *    out-degree owns a quadratic wedge set.
  *  - [[triangleStatsByDegree]] orients by (degree, id) rank
  *    (Ortmann/Brandes' standard degree ordering): each node's
  *    out-degree is O(√m), so Σ outdeg² ≤ m·√m REGARDLESS of hubs —
  *    the production path at scale. Same triangle set, because any
  *    total order on nodes counts each triangle exactly once at its
  *    order-minimum vertex.
  */
object GraphMetrics {

  /** k-core membership by iterated peeling: drop every node whose degree
    * among SURVIVORS falls below k, repeat. Runs a FIXED `rounds` budget
    * with a fixpoint early-exit (bit-identical to the mirror's full
    * unroll, since post-fixpoint rounds are the identity) and a loud
    * under-peel guard — a cascade deeper than `rounds` fails instead of
    * silently returning a superset (the one failure class the
    * identically-unrolled mirror cannot catch).
    *
    * TWO execution paths, provably the same peel (KCorePathSpec):
    *
    *  - edge sets <= `maxDriverEdges` run the peel ON THE DRIVER over
    *    the collected long-pair edge list (the repo's thresholded-
    *    collect discipline: bounded at ~16 B/edge, loud parameter).
    *    Spark's per-round fixed cost is 3 shuffle stages; on a
    *    subgraph-scale peel (a dup-cluster QA graph is pairs-sized,
    *    orders smaller than the corpus) 10 rounds of stage latency
    *    dominate the actual work by 10x+ — measured 5.1 s distributed
    *    vs ~0.2 s local for the sf0.1 near-dup graph.
    *  - larger edge sets run the distributed loop: per round one
    *    survivor-filtered degree count (two equi-joins + groupBy),
    *    survivor set checkpointed per round to keep plans flat (the
    *    iterative-algorithm discipline PageRank documents). At 100 TB
    *    the data amortizes the stage latency that dominates the small
    *    case.
    *
    * Returns one row per input id: (id, in_core 0/1). */
  def kCore(ids: DataFrame, idCol: String, pairs: DataFrame, k: Int,
      rounds: Int = 10, maxDriverEdges: Long = 2000000L): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k>=1, rounds>=1; got $k/$rounds")
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    val m = edges.count()
    val alive =
      if (m <= maxDriverEdges) peelLocal(edges, k, rounds)
      else peelDistributed(ids, idCol, edges, k, rounds)
    ids.select(col(idCol).as("id"))
      .join(alive.withColumn("in_core", lit(1L)), Seq("id"), "left")
      .select(col("id"), coalesce(col("in_core"), lit(0L)).as("in_core"))
  }

  private def underPeelMsg(rounds: Int, n: Long, k: Int): String =
    s"kCore did not reach the peel fixpoint within $rounds rounds " +
      s"($n nodes still alive, k=$k) — the cascade is deeper than the " +
      "unrolled-mirror contract covers. Raise `rounds` (and unroll the " +
      "mirror to match)."

  /** Driver-side peel over the collected edge list — the exact same
    * survivor-degree-threshold rule as the distributed loop (integer
    * counts, no ordering sensitivity), so the alive set is identical by
    * construction. Nodes outside the edge list never survive (k >= 1
    * and their degree is 0), matching the mirror's round-1 drop. */
  private def peelLocal(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es: Array[(Long, Long)] = edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)].collect()
    var alive = scala.collection.mutable.LongMap.empty[Boolean]
    es.foreach { case (s, _) => alive.update(s, true) }
    var r = 0
    var stable = false
    while (r < rounds && !stable) {
      val deg = scala.collection.mutable.LongMap.empty[Long]
      es.foreach { case (s, d) =>
        if (alive.contains(s) && alive.contains(d))
          deg.update(s, deg.getOrElse(s, 0L) + 1L)
      }
      val next = scala.collection.mutable.LongMap.empty[Boolean]
      deg.foreach { case (id, c) => if (c >= k) next.update(id, true) }
      stable = next.size == alive.size
      alive = next
      r += 1
    }
    require(stable, underPeelMsg(rounds, alive.size.toLong, k))
    alive.keys.toSeq.toDF("id")
  }

  /** Distributed peel: one survivor-filtered degree count per round. */
  private def peelDistributed(ids: DataFrame, idCol: String,
      edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var alive = ids.select(col(idCol).as("id")).localCheckpoint()
    // Early exit at the fixpoint: once no node peels, every further
    // round is the identity, so stopping gives BIT-IDENTICAL results to
    // the mirror's full unroll while paying only cascade-depth rounds.
    var n = alive.count()
    var r = 0
    var stable = false
    while (r < rounds && !stable) {
      alive = edges
        .join(alive.select(col("id").as("src")), "src")
        .join(alive.select(col("id").as("dst")), "dst")
        .groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("src").as("id"))
        .localCheckpoint()
      val n2 = alive.count()
      stable = n2 == n
      n = n2
      r += 1
    }
    // Loud under-peel guard (same contract as the local path).
    require(stable, underPeelMsg(rounds, n, k))
    alive
  }

  /** (id, n_triangles, coeff): triangles per node and local clustering
    * coefficient 2T/(deg·(deg−1)) rounded to 6dp (0.0 where deg < 2),
    * one row for EVERY id in `ids` (zero-filled). `pairs` holds
    * deduplicated undirected edges as (id_a < id_b). */
  def triangleStats(ids: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame = {
    val e = pairs.select(col("id_a"), col("id_b"))
    // triangles u<v<w: wedge (u,v)(v,w) + closing edge (u,w)
    val tri = e.select(col("id_a").as("u"), col("id_b").as("v"))
      .join(e.select(col("id_a").as("v"), col("id_b").as("w")), "v")
      .join(e.select(col("id_a").as("u"), col("id_b").as("w")),
        Seq("u", "w"))
    val perNode = tri.select(explode(array(col("u"), col("v"), col("w")))
        .as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("t"))
    val deg = e.select(col("id_a").as("id"))
      .union(e.select(col("id_b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    ids.select(col(idCol).as("id"))
      .join(deg, Seq("id"), "left")
      .join(perNode, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("t"), lit(0L)).as("n_triangles"),
        when(coalesce(col("deg"), lit(0L)) < 2, lit(0.0))
          .otherwise(round(
            lit(2.0) * coalesce(col("t"), lit(0L)) /
              (col("deg") * (col("deg") - 1)), 6))
          .as("coeff"))
  }

  /** [[triangleStats]] with DEGREE-ordered edge orientation — the hub-safe
    * production form. Orient every edge from its (deg, id)-smaller
    * endpoint; wedges form only between a node's OUT-edges, and a node's
    * out-degree under degree ordering is O(√m) (it can only point at
    * nodes of equal-or-higher degree, and there are at most 2√m nodes of
    * degree ≥ √m), so the wedge volume is bounded by m·√m even when one
    * hub touches everything. Output and semantics identical to
    * [[triangleStats]] — any total order counts each triangle exactly
    * once at its order-minimum vertex — and GraphMetricsSpec proves the
    * two orientations equal, including on a star graph where the id
    * orientation's wedge set is quadratic. */
  def triangleStatsByDegree(ids: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame = {
    val e = pairs.select(col("id_a"), col("id_b"))
    val deg = e.select(col("id_a").as("id"))
      .union(e.select(col("id_b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // Orient src → dst with (deg, id) ascending; carry dst's degree so
    // the wedge join can order its two spokes without re-joining deg.
    // The degree side is vocabulary-of-nodes sized relative to edges and
    // joins by equi-key; input contract id_a < id_b breaks (deg) ties.
    val withDeg = e
      .join(deg.select(col("id").as("id_a"), col("deg").as("da")), "id_a")
      .join(deg.select(col("id").as("id_b"), col("deg").as("db")), "id_b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("id_a") < col("id_b"))
    val oriented = withDeg.select(
        when(aFirst, col("id_a")).otherwise(col("id_b")).as("src"),
        when(aFirst, col("id_b")).otherwise(col("id_a")).as("dst"),
        when(aFirst, col("db")).otherwise(col("da")).as("ddst"))
      // The wedge join references this frame three times — materialize
      // once (the SimHash/gram-join lesson).
      .localCheckpoint()
    // Wedge at u between out-edges (u→v), (u→w) with v before w in the
    // (deg, id) order; triangle iff the oriented edge (v→w) exists.
    val tri = oriented.select(col("src").as("u"), col("dst").as("v"),
        col("ddst").as("dv"))
      .join(oriented.select(col("src").as("u"), col("dst").as("w"),
        col("ddst").as("dw")), "u")
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
      .join(oriented.select(col("src").as("v"), col("dst").as("w")),
        Seq("v", "w"))
    val perNode = tri.select(explode(array(col("u"), col("v"), col("w")))
        .as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("t"))
    ids.select(col(idCol).as("id"))
      .join(deg, Seq("id"), "left")
      .join(perNode, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("t"), lit(0L)).as("n_triangles"),
        when(coalesce(col("deg"), lit(0L)) < 2, lit(0.0))
          .otherwise(round(
            lit(2.0) * coalesce(col("t"), lit(0L)) /
              (col("deg") * (col("deg") - 1)), 6))
          .as("coeff"))
  }
}
