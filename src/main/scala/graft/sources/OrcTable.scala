package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC source/sink — the second columnar format next to parquet.
  * Spark's ORC support is native (vectorized reader, predicate pushdown
  * via ORC row-group stats, same `spark.read`/`write` surface), so the
  * operator is thin by design: the value here is the verified CONTRACT,
  * not plumbing — [[roundTrip]] materializes a frame as ORC and serves
  * the read-back, and `q_orc_scan` proves the round-tripped data
  * aggregates identically to the parquet original under the DuckDB
  * oracle (DuckDB reads the PARQUET side, so any ORC write/read drift —
  * types, nulls, timestamps — breaks the hash).
  *
  * Why a pipeline wants it: ORC is what Hive/Trino warehouses hand
  * over; an ingestion edge that reads ORC exactly (and can write it
  * back for those consumers) keeps graft interoperable without a
  * conversion hop. */
object OrcTable {

  private val cache = new graft.util.SessionCache[String]

  /** Write `df` as ORC once per (session, dataset-key), return the
    * read-back frame. The write lands in a fresh per-build dir
    * ([[graft.util.IndexPaths]] discipline — concurrent sessions never
    * collide). */
  def roundTrip(spark: SparkSession, datasetKey: String,
      df: => DataFrame): DataFrame = {
    val path = cache.getOrElseUpdate(spark, datasetKey) {
      val p = graft.util.IndexPaths.fresh(datasetKey, "orc")
      df.write.mode("overwrite").orc(p)
      p
    }
    spark.read.orc(path)
  }
}
