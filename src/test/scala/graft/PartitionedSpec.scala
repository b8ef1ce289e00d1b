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

  test("compaction refuses equivalent spellings of the input path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-same").toString
    Tables.documents(spark, sf001).limit(5).write
      .mode("overwrite").parquet(dir)
    val err = intercept[IllegalArgumentException] {
      graft.sources.Compaction.compact(spark, dir, dir + "/",
        Seq(col("doc_id")))
    }
    assert(err.getMessage.contains("new location"))
    // input untouched
    assert(spark.read.parquet(dir).count() === 5)
  }

  test("zorderKey interleaves bits dims-major") {
    import spark.implicits._
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (i * 2)) | (((y >> i) & 1L) << (i * 2 + 1))
      }
    val cases = Seq((3L, 1L), (0L, 0L), (255L, 0L), (0L, 255L), (170L, 85L))
    val got = cases.toDF("x", "y")
      .select(graft.sources.Compaction.zorderKey(Seq($"x", $"y"), 8))
      .as[Long].collect().toSeq
    assert(got === cases.map { case (x, y) => ref(x, y, 8) })
  }

  test("zorder compaction localizes BOTH dimensions; range sort only one") {
    import spark.implicits._
    val ev = Tables.events(spark, sf001)
      .select(($"user_id" % 256).as("x"), ($"event_id" % 256).as("y"))
    val in = java.nio.file.Files.createTempDirectory("graft-z-in").toString
    ev.write.mode("overwrite").parquet(in)
    def spans(path: String): (Double, Double) = {
      val files = new java.io.File(path).listFiles
        .filter(_.getName.endsWith(".parquet"))
      val s = files.map { f =>
        spark.read.parquet(f.getPath)
          .agg(max($"x") - min($"x"), max($"y") - min($"y"))
          .as[(Long, Long)].head()
      }
      (s.map(_._1).sum.toDouble / s.length, s.map(_._2).sum.toDouble / s.length)
    }
    val zout = java.nio.file.Files.createTempDirectory("graft-z-out")
      .toString + "/t"
    graft.sources.Compaction.compactZOrder(spark, in, zout,
      Seq(col("x"), col("y")), bitsPerDim = 8, targetRecordsPerFile = 64L)
    val xout = java.nio.file.Files.createTempDirectory("graft-x-out")
      .toString + "/t"
    graft.sources.Compaction.compact(spark, in, xout,
      Seq(col("x")), targetRecordsPerFile = 64L)
    val (zx, zy) = spans(zout)
    val (xx, xy) = spans(xout)
    // x-sorted localizes x but leaves y wide; z-order localizes BOTH —
    // its y-span must beat the x-sorted layout's y-span by a clear
    // margin while keeping x well below the global 255 range.
    assert(zy < xy * 0.75, s"zorder y-span $zy not < 0.75 × x-sorted $xy")
    assert(zx < 150, s"zorder x-span too wide: $zx (x-sorted baseline $xx)")
    assert(spark.read.parquet(zout).count() === ev.count())
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

  test("lengthHistogram excludes null text instead of clamp-binning it") {
    import spark.implicits._
    val df = Seq(Some("ab"), None, Some("abcd"), None).toDF("text")
    val bins = graft.operators.Profiling.lengthHistogram(df, binWidth = 5,
        clampLen = 300)
      .as[(Int, Long)].collect().toMap
    // both real lengths land in bin 0; the nulls appear NOWHERE — before
    // the fix least(null, 300)=300 put them in the clamp bin
    assert(bins === Map(0 -> 2L))
  }
}
