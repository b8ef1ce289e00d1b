package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-GROUP resolution: near-dup detectors (MinHash, SimHash,
  * embedding cosine) emit PAIRS, but a dedup pipeline must drop whole
  * transitive groups — A~B and B~C puts A,B,C in one group even when
  * A~C itself fell below threshold. pairs → connected components →
  * survivor per component → anti-join drop.
  *
  * Components via iterative min-label propagation ("hash-to-min"): every
  * vertex starts labeled with its own id; each round every vertex takes
  * the min label among itself and its neighbors; converged when no label
  * changes. Rounds needed = graph diameter — near-dup groups are
  * star/chain shaped with tiny diameters, so this converges in a handful
  * of rounds (each round: one shuffle join + one aggregation). For
  * adversarially long chains at 100 TB, switch to the large-star/
  * small-star algorithm (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14) — same join primitives, O(log² n)
  * rounds; the propagation loop below is the right default for dedup
  * workloads where diameter ≈ 2-4.
  *
  * Lineage per round is cut with localCheckpoint (iterative self-joins
  * otherwise stack exponentially growing plans).
  */
object DedupGroups {

  /** (id, component) for every row of `ids`, where component = min id
    * reachable through `pairs` (id_a, id_b). Vertices without any pair
    * are their own singleton component.
    *
    * The propagation loop runs ONLY over vertices that appear in a pair
    * — in a dedup workload that's a small fraction of the corpus (dup
    * rate × corpus, vs the corpus itself), so each round's join touches
    * the duplicate graph, not the dataset. Singletons are stamped with
    * their own id in one final left join. */
  def connectedComponents(ids: DataFrame, idCol: String, pairs: DataFrame,
      maxRounds: Int = 25): DataFrame = {
    // Materialize the pair set BEFORE mirroring it: the two union
    // branches are separate subplans to Spark, so an un-materialized
    // `pairs` (often an expensive similarity join) would execute twice.
    val p = pairs.select(col("id_a"), col("id_b")).localCheckpoint()
    val edges = p
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(p.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint()
    // Loop shuffles run at session shuffle partitioning; AQE coalesces
    // the tiny post-shuffle partitions. (Deliberately NOT mutating the
    // session's shuffle.partitions conf here: a library operator must
    // not reconfigure concurrent queries on a shared session, and the
    // measured gain was noise.)
    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      // min over neighbors' labels, per vertex...
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("comp")).as("ncomp"))
      // ...and pointer-jump through the own label (comp of comp):
      // neighbor propagation alone needs diameter rounds (a chain of
      // k sequential near-dups takes k rounds); the jump halves the
      // remaining path each round -> O(log diameter) total. Label ids
      // are unique in `labels`, so the rename-join is 1:1.
      val jumped = labels
        .join(labels.select(col("id").as("comp"), col("comp").as("jcomp")),
          Seq("comp"), "left")
      val step = jumped.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(least(col("comp"), coalesce(col("jcomp"), col("comp"))),
            coalesce(col("ncomp"), col("comp"))).as("newcomp"),
          col("comp"))
        .select(col("id"), col("newcomp").as("comp"),
          (col("newcomp") < col("comp")).as("changed"))
        .localCheckpoint()
      changed = step.filter(col("changed")).count()
      labels = step.select(col("id"), col("comp"))
      round += 1
    }
    if (round >= maxRounds && changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds")
    ids.select(col(idCol).as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }

  /** Survivor selection + drop: keep exactly one row per duplicate
    * component (the min id — deterministic), all singletons untouched.
    * Equivalent anti-join form: drop rows whose component label is
    * smaller than their own id. */
  def resolve(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comps = connectedComponents(df.select(col(idCol)), idCol, pairs)
    df.join(comps.filter(col("comp") =!= col("id"))
        .select(col("id").as(idCol)),
      Seq(idCol), "left_anti")
  }
}
