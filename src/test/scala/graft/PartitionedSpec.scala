// (Compaction spec lives here too: both are physical-layout concerns.)
package graft

import org.apache.spark.sql.functions._
import graft.sources.PartitionedParquet

class PartitionedSpec extends SparkSpec {

  test("partitioned write + filter prunes partitions in the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    PartitionedParquet.write(
      Tables.documents(spark, sf001), dir, Seq("lang"))
    val back = PartitionedParquet.read(spark, dir)
    val filtered = back.filter(col("lang") === "en")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"partition filter not pruned:\n$plan")
    val expected = Tables.documents(spark, sf001)
      .filter(col("lang") === "en").count()
    assert(filtered.count() === expected)
    // round-trip completeness
    assert(back.count() === Tables.documents(spark, sf001).count())
  }

  test("compaction: fragmented dir -> few range-sorted files, disjoint ranges") {
    import spark.implicits._
    val frag = java.nio.file.Files.createTempDirectory("graft-frag").toString
    val out = java.nio.file.Files.createTempDirectory("graft-comp")
      .toString + "/t"
    val docs = Tables.documents(spark, sf001)
    docs.repartition(40).write.mode("overwrite").parquet(frag)
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles.filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles(frag).length === 40)

    graft.sources.Compaction.compact(spark, frag, out,
      Seq(col("doc_id")), targetRecordsPerFile = 200L)
    val files = parquetFiles(out)
    val n = docs.count()
    assert(files.length === ((n + 199) / 200).toInt,
      s"expected ceil($n/200) files, got ${files.length}")
    // completeness + per-file key ranges are disjoint (the property that
    // lets parquet min/max stats prune point reads)
    assert(spark.read.parquet(out).count() === n)
    val ranges = files.map { f =>
      spark.read.parquet(f.getPath)
        .agg(min($"doc_id"), max($"doc_id")).as[(Long, Long)].head()
    }.sortBy(_._1)
    assert(ranges.zip(ranges.tail).forall { case ((_, aMax), (bMin, _)) =>
      aMax < bMin }, s"file key ranges overlap: ${ranges.toSeq}")
  }

  test("profile computes exact per-column stats in one job") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("b")),
      (4L, Some("a"))).toDF("id", "tag")
    val prof = graft.operators.Profiling.profile(df, Seq("id", "tag"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(prof("id") === ("id", 4L, 0L, 4L, "1", "4"))
    assert(prof("tag") === ("tag", 4L, 1L, 2L, "a", "b"))
  }
}
