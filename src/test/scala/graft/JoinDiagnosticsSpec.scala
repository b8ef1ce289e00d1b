package graft

import org.apache.spark.sql.functions._
import graft.operators.JoinDiagnostics

class JoinDiagnosticsSpec extends SparkSpec {
  import spark.implicits._

  test("joinCardinality total == the actual inner-join row count") {
    val cust = Tables.customer(spark, sf001)
    val ord = Tables.orders(spark, sf001)
      .select($"o_custkey".as("c_custkey"))
    val predicted = JoinDiagnostics.outputRows(cust, ord, Seq("c_custkey"))
    val actual = cust.join(ord, "c_custkey").count()
    assert(predicted === BigDecimal(actual))
    assert(actual > 0L)
  }

  test("per-key rows are exact and keys on one side only are absent") {
    val l = Seq(("a", 1), ("a", 2), ("b", 1), ("c", 1))
      .toDF("k", "v")
    val r = Seq(("a", 9), ("a", 8), ("a", 7), ("b", 9), ("d", 9))
      .toDF("k", "v")
    val got = JoinDiagnostics.joinCardinality(l, r, Seq("k"))
      .withColumn("n_pairs", $"n_pairs".cast("long")) // test-scale fits
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(("a", 2L, 3L, 6L), ("b", 1L, 1L, 1L)))
  }

  test("self-join cardinality counts ordered pairs incl. self-matches") {
    val df = Seq("a", "a", "a", "b").toDF("k")
    val got = JoinDiagnostics.joinCardinality(df, df, Seq("k"))
      .withColumn("n_pairs", $"n_pairs".cast("long"))
      .as[(String, Long, Long, Long)].collect()
      .map { case (k, _, _, p) => k -> p }.toMap
    assert(got === Map("a" -> 9L, "b" -> 1L))
    // the a.id < b.id candidate form derived per the scaladoc
    assert((got.values.sum - df.count()) / 2 ===
      df.as[String].collect().groupBy(identity)
        .values.map(g => g.size.toLong * (g.size - 1) / 2).sum)
  }

  test("requireBounded trips below the exact size, passes at it") {
    val li = Tables.lineitem(spark, sf001).select($"l_partkey")
    val exact = JoinDiagnostics.outputRows(li, li, Seq("l_partkey"))
    val e = intercept[IllegalArgumentException] {
      JoinDiagnostics.requireBounded(li, li, Seq("l_partkey"),
        (exact - 1).toLongExact)
    }
    assert(e.getMessage.contains("would produce") &&
      e.getMessage.contains("worst single key"))
    assert(JoinDiagnostics.requireBounded(li, li, Seq("l_partkey"),
      exact.toLongExact) === exact)
  }

  test("n_pairs past Long.MaxValue stays exact and still trips the guard") {
    // 4e9 × 4e9 = 1.6e19 > Long.MaxValue (9.22e18): the long form wrapped
    // negative here and requireBounded passed silently — the decimal(38,0)
    // path must report the exact product and still trip. range() rows are
    // generated, never materialized, so this runs as two codegen'd counts.
    val big = spark.range(4000000000L).select(lit(1L).as("k"))
    val pairs = JoinDiagnostics.joinCardinality(big, big, Seq("k"))
      .select($"n_pairs".cast("string")).as[String].head()
    assert(BigDecimal(pairs) === BigDecimal("16000000000000000000"))
    assert(BigDecimal(pairs) > BigDecimal(Long.MaxValue))
    val e = intercept[IllegalArgumentException] {
      JoinDiagnostics.requireBounded(big, big, Seq("k"), Long.MaxValue)
    }
    assert(e.getMessage.contains("16000000000000000000"))
  }
}
