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
}
