package graft

import org.apache.spark.sql.functions._
import graft.sources.OrcTable

class OrcTableSpec extends SparkSpec {

  test("ORC round-trip preserves schema and every row, timestamps included") {
    val ev = Tables.events(spark, sf001)
    val back = OrcTable.roundTrip(spark, sf001 + "#spec", ev)
    assert(back.schema === ev.schema,
      s"schema drift through ORC: ${back.schema} vs ${ev.schema}")
    val key = ev.columns.map(col)
    assert(back.select(key: _*).collect().toSet ===
      ev.select(key: _*).collect().toSet)
    assert(back.count() === ev.count())
  }

  test("round-trip is memoized per (session, dataset-key)") {
    var builds = 0
    def frame = { builds += 1; Tables.documents(spark, sf001) }
    OrcTable.roundTrip(spark, sf001 + "#memo", frame).count()
    OrcTable.roundTrip(spark, sf001 + "#memo", frame).count()
    assert(builds === 1, "the by-name frame must be forced exactly once")
  }
}
