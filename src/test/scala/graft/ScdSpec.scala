package graft

import org.apache.spark.sql.functions._
import graft.operators.Scd
import java.sql.Timestamp

/** SCD Type-2 invariants: intervals tile each key's timeline exactly,
  * versions are consecutive with no adjacent-equal attributes, every
  * source event's attribute is recoverable from its covering interval,
  * and the point-in-time read equals a brute-force replay. */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  private def feed = Seq(
    // user 1: A A B B A  -> 3 versions
    (1L, ts(0), 1L, "A"), (1L, ts(10), 2L, "A"), (1L, ts(20), 3L, "B"),
    (1L, ts(30), 4L, "B"), (1L, ts(40), 5L, "A"),
    // user 2: single state
    (2L, ts(5), 6L, "X"),
    // user 3: null-attr handling — null, null, Y, null
    (3L, ts(1), 7L, null), (3L, ts(2), 8L, null), (3L, ts(3), 9L, "Y"),
    (3L, ts(4), 10L, null)
  ).toDF("user_id", "ts", "event_id", "attr_in")

  private def hist = Scd.history(feed, "user_id", "ts", "event_id",
    col("attr_in"))

  test("history: versions consecutive, no adjacent-equal attrs, one current") {
    val h = hist.orderBy("user_id", "version")
      .as[(Long, Long, Option[String], Long, Option[Long], Boolean)]
      .collect().toSeq
    val byUser = h.groupBy(_._1)
    assert(byUser(1L).map(_._3) == Seq(Some("A"), Some("B"), Some("A")))
    assert(byUser(2L).map(_._3) == Seq(Some("X")))
    assert(byUser(3L).map(_._3) == Seq(None, Some("Y"), None))
    for ((_, rows) <- byUser) {
      assert(rows.map(_._2) == (1L to rows.size).toSeq, "versions")
      rows.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._3 != b._3, "adjacent intervals must differ")
          assert(a._5.contains(b._4), "valid_to must equal next valid_from")
        case _ =>
      }
      assert(rows.count(_._6) == 1, "exactly one current row per key")
      assert(rows.last._5.isEmpty, "current row open-ended")
    }
  }

  test("every source event's attr is recoverable from its interval") {
    val h = hist
    val ev = feed.select(col("user_id"),
      unix_micros(col("ts")).as("us"), col("attr_in"))
    val recovered = ev.join(h, ev("user_id") === h("user_id") &&
        col("us") >= col("valid_from") &&
        (col("valid_to").isNull || col("us") < col("valid_to")))
    assert(recovered.count() == feed.count())
    assert(recovered.filter(!(col("attr_in") <=> col("attr"))).count() == 0)
  }

  test("snapshotAt equals a brute-force replay at T") {
    val tUs = 1700000000000000L + 15L * 60000000L // minute 15
    val got = Scd.snapshotAt(hist, tUs)
      .select("user_id", "attr").as[(Long, Option[String])]
      .collect().toMap
    // replay: latest event at or before T per user
    val want = feed.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000L,
        Option(r.getString(3))))
      .filter(_._2 <= tUs)
      .groupBy(_._1).view.mapValues(_.maxBy(_._2)._3).toMap
    assert(got == want)
    assert(!got.contains(1L) || got(1L) == Some("A")) // minute 15: still A
  }
}
