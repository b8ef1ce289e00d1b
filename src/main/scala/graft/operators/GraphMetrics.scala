package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohesion metrics over an undirected pair graph: per-node triangle
  * counts and the local clustering coefficient — the standard QA signal
  * for duplicate clusters (a clique-like component is one entity; a
  * star-like one is a hub string chaining unrelated near-misses, the
  * thing an anchor-wins prune should NOT collapse).
  *
  * Shape: the classic oriented-wedge join. Edges are kept oriented
  * low-id → high-id (the input contract, `id_a < id_b`), so every
  * triangle {u < v < w} is counted EXACTLY once as the wedge
  * (u,v)+(v,w) closed by (u,w) — two equi-joins, no distinct pass, and
  * the wedge count Σ deg(v)² is the only quadratic-ish term (the
  * standard mitigation at extreme scale is orienting by DEGREE instead
  * of id; id-orientation keeps the oracle mirror trivial and is
  * documented as the contract here).
  */
object GraphMetrics {

  /** k-core membership by iterated peeling: drop every node whose degree
    * among SURVIVORS falls below k, repeat. Runs a FIXED `rounds` count
    * (not to-convergence) so the DuckDB mirror can unroll the identical
    * rounds — a peel cascade longer than `rounds` would under-peel, so
    * callers size rounds above the expected cascade depth (each round
    * peels at least one node of any unstable chain; 10 covers any
    * fixture-sized tail, and the spec asserts a fixpoint was reached).
    * Each round is one degree count over survivor-filtered edges; the
    * survivor set is checkpointed per round to keep plans flat (the
    * iterative-algorithm discipline PageRank documents).
    *
    * Returns one row per input id: (id, in_core 0/1). */
  def kCore(ids: DataFrame, idCol: String, pairs: DataFrame, k: Int,
      rounds: Int = 10): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k>=1, rounds>=1; got $k/$rounds")
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    var alive = ids.select(col(idCol).as("id")).localCheckpoint()
    // Early exit at the fixpoint: once no node peels, every further
    // round is the identity, so stopping gives BIT-IDENTICAL results to
    // the mirror's full unroll while paying only cascade-depth rounds
    // (the checkpoint already materialized the frame — the count is a
    // cached-size read, not a job).
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
    ids.select(col(idCol).as("id"))
      .join(alive.withColumn("in_core", lit(1L)), Seq("id"), "left")
      .select(col("id"), coalesce(col("in_core"), lit(0L)).as("in_core"))
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
}
