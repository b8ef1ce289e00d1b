package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketed

class BucketedSpec extends SparkSpec {

  test("bucketed join runs without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bucket_test " +
        s"LOCATION '$wh'")
      spark.sql("USE graft_bucket_test")
      Bucketed.write(Tables.lineitem(spark, sf001), "li_b", "l_orderkey", 8)
      Bucketed.write(Tables.orders(spark, sf001), "o_b", "o_orderkey", 8)
      val joined = Bucketed.join(spark, "li_b", "o_b",
        ("l_orderkey", "o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      val expected = Tables.lineitem(spark, sf001).join(
        Tables.orders(spark, sf001),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
      // bucketed aggregation on the bucket key: no exchange either
      val agg = spark.table("li_b").groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "bucketed agg must not shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP DATABASE IF EXISTS graft_bucket_test CASCADE")
      spark.sql("USE default")
    }
  }
}
