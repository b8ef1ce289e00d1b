package graft

import org.apache.spark.sql.functions._
import graft.operators.TypedOps

class TypedOpsSpec extends SparkSpec {
  import spark.implicits._

  test("Money.centsOf matches Spark round() on negative half-cents") {
    import org.apache.spark.sql.functions._
    val vals = Seq(-0.125, 0.125, -1.005, 1.005, -12.345, 0.0, 99.994)
    val sparkCents = vals.toDF("v")
      .select(graft.functions.Money.cents($"v")).as[Long].collect().toSeq
    assert(vals.map(graft.functions.Money.centsOf) === sparkCents)
    // the math.round form this replaced disagrees on exactly this case
    assert(graft.functions.Money.centsOf(-0.125) === -13L)
    assert(math.round(-0.125 * 100) === -12L)
  }

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
