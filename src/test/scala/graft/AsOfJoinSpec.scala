package graft

import java.sql.Timestamp
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join picks latest right row at or before left ts, per key") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-01 10:30:00"), 200.0)
    ).toDF("qk", "qts", "price")
    val trades = Seq(
      (1L, 1L, ts("2024-01-01 10:30:00")), // -> 100.0
      (2L, 1L, ts("2024-01-01 11:00:00")), // ties: right first -> 110.0
      (3L, 2L, ts("2024-01-01 10:00:00")), // before any quote -> null
      (4L, 3L, ts("2024-01-01 12:00:00"))  // key with no quotes -> null
    ).toDF("trade_id", "tk", "tts")
    val out = AsOfJoin.asof(trades, quotes, "tk", "qk", "tts", "qts",
        Seq("price"))
      .select($"trade_id", $"price").as[(Long, Option[Double])]
      .collect().toMap
    assert(out === Map(1L -> Some(100.0), 2L -> Some(110.0),
      3L -> None, 4L -> None))
  }

  test("tolerance bound rejects stale matches; exact boundary is kept (<=)") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (2L, ts("2024-01-01 09:00:00"), 200.0)
    ).toDF("qk", "qts", "price")
    val trades = Seq(
      (1L, 1L, ts("2024-01-01 10:20:00")), // 20 min stale -> kept
      (2L, 1L, ts("2024-01-01 10:30:00")), // EXACTLY 30 min -> kept (<=)
      (3L, 1L, ts("2024-01-01 10:30:01")), // 30 min 1 s -> rejected
      (4L, 2L, ts("2024-01-01 11:00:00"))  // 2 h stale -> rejected
    ).toDF("trade_id", "tk", "tts")
    val out = AsOfJoin.asof(trades, quotes, "tk", "qk", "tts", "qts",
        Seq("price"), toleranceUs = Some(30L * 60 * 1000000))
      .select($"trade_id", $"price").as[(Long, Option[Double])]
      .collect().toMap
    assert(out === Map(1L -> Some(100.0), 2L -> Some(100.0),
      3L -> None, 4L -> None))
    // and the unbounded form still matches all four
    val unbounded = AsOfJoin.asof(trades, quotes, "tk", "qk", "tts", "qts",
        Seq("price"))
      .select($"trade_id", $"price").as[(Long, Option[Double])]
      .collect().toMap
    assert(unbounded === Map(1L -> Some(100.0), 2L -> Some(100.0),
      3L -> Some(100.0), 4L -> Some(200.0)))
  }

  test("NULL keys and NULL timestamps never match (SQL ASOF semantics)") {
    val quotes = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00")), 100.0),
      (Some(1L), None, 999.0),   // null ts: must never seed a payload
      (None, Some(ts("2024-01-01 09:00:00")), 888.0) // null key: never matches
    ).toDF("qk", "qts", "price")
    val trades = Seq(
      (1L, Some(1L), Some(ts("2024-01-01 10:30:00"))), // -> 100.0
      (2L, Some(1L), Some(ts("2024-01-01 09:30:00"))), // before quote -> null
      (3L, None, Some(ts("2024-01-01 10:30:00"))),     // null key -> null
      (4L, Some(1L), None)                              // null ts -> null
    ).toDF("trade_id", "tk", "tts")
    val out = AsOfJoin.asof(trades, quotes, "tk", "qk", "tts", "qts",
        Seq("price"))
      .select($"trade_id", $"price").as[(Long, Option[Double])]
      .collect().toMap
    assert(out === Map(1L -> Some(100.0), 2L -> None, 3L -> None, 4L -> None))
  }

  test("asof join keeps every left row exactly once") {
    val ev = Tables.events(spark, sf001).select($"event_id", $"user_id", $"ts")
    val ord = Tables.orders(spark, sf001)
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(org.apache.spark.sql.functions.max($"o_orderkey").as("o_orderkey"))
    val out = AsOfJoin.asof(ev, ord, "user_id", "o_custkey", "ts",
      "o_orderdate", Seq("o_orderkey"))
    assert(out.count() === ev.count())
  }
}
