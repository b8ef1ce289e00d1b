package graft

import org.apache.spark.sql.functions._
import graft.operators.TypedOps

class TypedOpsSpec extends SparkSpec {
  import spark.implicits._

  test("typed dataset views expose case-class fields") {
    val d = TypedOps.docs(spark, sf001)
    assert(d.filter(_.lang == "en").count() ===
      Tables.documents(spark, sf001).filter($"lang" === "en").count())
  }

  test("typed CentSum aggregator equals untyped exact-cents sum") {
    val typed = TypedOps.valueTotalsByType(spark, sf001)
      .collect().toMap
    val untyped = Tables.events(spark, sf001)
      .groupBy($"event_type")
      .agg((sum(round($"value" * 100, 0).cast("long")).cast("double") / 100.0)
        .as("total"))
      .as[(String, Double)].collect().toMap
    assert(typed === untyped)
  }
}
