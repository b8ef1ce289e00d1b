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
}
