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
    * are their own singleton component. */
  def connectedComponents(ids: DataFrame, idCol: String, pairs: DataFrame,
      maxRounds: Int = 25): DataFrame = {
    val edges = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = ids.select(col(idCol).as("id"), col(idCol).as("comp"))
      .localCheckpoint()
    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      // min over neighbors' labels, per vertex
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("comp")).as("ncomp"))
      val step = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"),
          (coalesce(col("ncomp"), col("comp")) < col("comp")).as("changed"))
        .localCheckpoint()
      changed = step.filter(col("changed")).count()
      labels = step.select(col("id"), col("comp"))
      round += 1
    }
    labels
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
