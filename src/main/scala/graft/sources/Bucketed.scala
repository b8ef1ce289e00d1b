package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: pre-shuffle fact tables once at write time so
  * every subsequent equi-join/aggregation on the bucket key runs with NO
  * exchange (verified by plan assertion in BucketedSpec).
  *
  * At 100 TB this is the difference between shuffling the fact table per
  * query and shuffling it once per ingest: two tables bucketed by the
  * same key into the same bucket count sort-merge join with zero network
  * traffic. Bucketing goes through the session catalog (bucket metadata
  * lives in the table definition, not the parquet files).
  */
object Bucketed {

  /** Write `df` as a catalog table bucketed by `key`. */
  def write(df: DataFrame, table: String, key: String, buckets: Int,
      sortBy: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    sortBy.fold(w)(s => w.sortBy(s)).saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Bucket-join two same-key/same-count bucketed tables (no shuffle). */
  def join(spark: SparkSession, left: String, right: String,
      key: (String, String)): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(left).join(spark.table(right),
      col(key._1) === col(key._2))
  }
}
