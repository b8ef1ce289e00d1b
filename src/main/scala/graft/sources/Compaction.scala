package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance pass every long-lived
  * 100 TB dataset needs: streaming/incremental writers leave thousands
  * of small files per partition (each an open/seek/footer-parse at read
  * time and a listing entry at planning time), and compaction rewrites
  * them into few large, RANGE-SORTED files.
  *
  * Sorting is the point, not a nicety: parquet stores per-row-group
  * min/max stats, so a range-sorted layout lets point and range reads
  * skip everything but the matching row groups — the poor man's
  * clustered index. This pairs with [[graft.ml.AnnIndex.probeHyperplaneIds]]
  * (id-sorted base fetch) and any key-ranged access pattern.
  */
object Compaction {

  /** Rewrite `inPath` parquet into `outPath` as ≈`targetRecordsPerFile`
    * files range-partitioned and sorted by `sortCols`. One count pass
    * sizes the job (a maintenance pass can afford it; pass
    * `knownRowCount` to skip it). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      sortCols: Seq[Column], targetRecordsPerFile: Long = 1000000L,
      knownRowCount: Option[Long] = None): Unit = {
    require(outPath != inPath,
      "compact to a new location, then swap — never overwrite the live dir in place")
    val df = spark.read.parquet(inPath)
    val n = knownRowCount.getOrElse(df.count())
    val files = math.max(1L, (n + targetRecordsPerFile - 1) / targetRecordsPerFile).toInt
    df.repartitionByRange(files, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .write.option("maxRecordsPerFile", targetRecordsPerFile)
      .mode("overwrite").parquet(outPath)
  }
}
