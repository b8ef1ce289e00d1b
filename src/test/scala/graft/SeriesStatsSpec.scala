package graft

import org.apache.spark.sql.functions._

/** Semantic contracts of the series/entropy queries that the oracle's
  * value equality can't express on its own: the statistics hit their
  * textbook landmarks on constructed inputs. */
class SeriesStatsSpec extends SparkSpec {
  import spark.implicits._

  test("burstiness: periodic series = -1, landmark bounds hold on real data") {
    // a perfectly periodic stream has sigma=0 -> B = (0-mu)/(0+mu) = -1
    val dir = java.nio.file.Files.createTempDirectory("graft-burst")
    val periodic = (1 to 50).map(i =>
      (i.toLong, new java.sql.Timestamp(i * 60000L), 1L, "tick", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    periodic.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val b = graft.queries.EventQueries.queries("q_interarrival")(
        spark, dir.toString)
      .select($"event_type", $"burstiness").as[(String, Double)]
      .collect().toMap
    assert(b("tick") === -1.0)
    // B in [-1, 1] by construction on the real fixture
    val real = graft.queries.EventQueries.queries("q_interarrival")(
        spark, sf001)
      .select($"burstiness").as[Double].collect()
    assert(real.nonEmpty && real.forall(v => v >= -1.0 && v <= 1.0))
  }

  test("char entropy: uniform text = ln(k) on the nano grid, runs = 0") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ent")
    Seq(
      (1L, "abcdabcdabcdabcd", "en", "s", 16L), // uniform over k=4
      (2L, "aaaaaaaaaaaaaaaa", "en", "s", 16L)  // one class -> H = 0
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val h = graft.queries.TextQueries.queries("q_char_entropy")(
        spark, dir.toString)
      .select($"doc_id", $"entropy_nano").as[(Long, Long)].collect().toMap
    assert(h(1L) === math.round(math.log(4.0) * 1e9),
      s"uniform-4 entropy ${h(1L)}")
    assert(h(2L) === 0L)
    // the natural-text band claim: real docs sit strictly between the
    // degenerate extremes
    val real = graft.queries.TextQueries.queries("q_char_entropy")(
        spark, sf001)
      .select($"entropy_nano").as[Long].collect()
    assert(real.nonEmpty && real.forall(v => v > 0L))
  }
}
