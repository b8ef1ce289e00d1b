package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.EventOps

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize splits on gaps > threshold and is per-user") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:10:00"), 2L),
      (1L, ts("2024-01-01 11:30:00"), 3L), // 80min gap → new session
      (2L, ts("2024-01-01 10:05:00"), 4L)
    ).toDF("user_id", "ts", "event_id")
    val out = EventOps.sessionize(df, "user_id", "ts", "event_id", 30)
      .select($"event_id", $"session_id").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("sessionStats aggregates bounds and counts") {
    val events = Tables.events(spark, sf001)
    val sessions = EventOps.sessionStats(
      EventOps.sessionize(events, "user_id", "ts", "event_id", 30),
      "user_id", "ts")
    val n = sessions.agg(sum($"n_events")).as[Long].head()
    assert(n === events.count(), "session event counts must partition all events")
  }

  test("runningTotal is monotone per user for non-negative values") {
    val out = EventOps.runningTotal(Tables.events(spark, sf001),
      "user_id", "ts", "event_id", "value")
    val bad = out.withColumn("prev",
        lag($"cum_value", 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"ts", $"event_id")))
      .filter($"prev".isNotNull && $"cum_value" < $"prev")
    assert(bad.count() === 0)
  }

  test("tumbling window partitions all events") {
    val events = Tables.events(spark, sf001)
    val total = EventOps.tumbling(events, "ts", "1 hour")
      .agg(sum($"n")).as[Long].head()
    assert(total === events.count())
  }

  test("sliding 1h/30m counts each event twice") {
    val events = Tables.events(spark, sf001)
    val total = EventOps.sliding(events, "ts", "1 hour", "30 minutes")
      .agg(sum($"n")).as[Long].head()
    assert(total === 2 * events.count())
  }
}
