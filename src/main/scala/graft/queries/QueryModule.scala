package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One module = one coherent slice of the operator inventory (SURVEY.md §2).
  * `queries` are the driver-runnable entries; `oracle` holds the DuckDB SQL
  * for the deterministic subset (queries absent from `oracle` get the
  * driver's weaker rows-only check — reserved for RNG/hash/ML operators).
  */
trait QueryModule {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracle: Map[String, String]

  /** One-time driver-side model fits this module memoizes per (session,
    * dataset) — k-means/PQ/BPE trainings whose first forcing otherwise
    * lands inside whichever query happens to run first (the r13
    * q_cluster_cap bench-attribution artifact: a shuffled order hands a
    * ~9 s Lloyd fit to a nondeterministic victim). `Bench` forces these
    * UNTIMED before the first timed run and records each warm's cost
    * under its own name, so the one-time cost stays visible in the
    * record while every timed query measures steady-state serving. */
  def warmups: Map[String, (SparkSession, String) => Unit] = Map.empty
}
