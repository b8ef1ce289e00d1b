package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style partitioned parquet layout: the physical organization that
  * makes 100 TB scans affordable — a filter on the partition column
  * prunes directories BEFORE any file is opened (PartitionFilters in the
  * scan node, asserted in PartitionedSpec), and each partition writes
  * independently (no global shuffle).
  *
  * Partition column choice rules: low-to-medium cardinality (a
  * date/lang/source — never a key), and pair with
  * `spark.sql.files.maxPartitionBytes` so per-directory file counts stay
  * sane. For high-cardinality co-location use Bucketed instead.
  */
object PartitionedParquet {

  def write(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
