package graft

import org.apache.spark.sql.functions._
import graft.functions.{BandExprs, BandOfExpr}
import graft.queries.TextQueries

/** The GK-digest rank-fusion path (q_quality_ensemble_gk) and its
  * row-local band expression: the band fraction must track the exact
  * form's strict-cdf normalized rank within the digest guarantee
  * (≤ 2/B + 2ε + order-stat slack), the keep cut must land near the
  * exact 60% line, the exact form must trip its corpus-wide-window
  * guard loudly, and the codegen'd binary search must agree with the
  * interpreted eval bit-for-bit (the KMeansAssignSpec discipline). */
class QualityEnsembleGkSpec extends SparkSpec {

  import spark.implicits._

  // --- BandOfExpr unit semantics ---

  private def bruteBand(v: Double, cuts: Array[Double], desc: Boolean): Int =
    if (desc) cuts.count(c => java.lang.Double.compare(c, v) > 0)
    else cuts.count(c => java.lang.Double.compare(c, v) < 0)

  test("band_of equals the brute count in both directions, incl. ties/NaN/±0") {
    val cuts = Array(-1.5, -0.0, 0.0, 0.0, 2.5, 2.5, 7.0, Double.NaN)
    val probes = Seq(-2.0, -1.5, -0.0, 0.0, 1.0, 2.5, 7.0, 8.0,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
    for (v <- probes; desc <- Seq(false, true)) {
      assert(BandOfExpr.band(v, cuts, desc) == bruteBand(v, cuts, desc),
        s"v=$v desc=$desc")
    }
  }

  test("band_of rejects unsorted cuts at construction") {
    val e = intercept[IllegalArgumentException] {
      BandOfExpr(org.apache.spark.sql.catalyst.expressions.Literal(1.0),
        Array(2.0, 1.0), desc = false)
    }
    assert(e.getMessage.contains("sorted"), e.getMessage)
  }

  test("codegen path (df.select) agrees with interpreted eval") {
    val cuts = Array(-3.0, -1.0, 0.0, 0.5, 0.5, 2.0, 9.5)
    val vals = Seq(-5.0, -3.0, -0.5, 0.0, 0.5, 1.0, 2.0, 10.0, Double.NaN)
    val df = vals.toDF("v")
    for (desc <- Seq(false, true)) {
      val got = df.select(BandExprs.bandOf(col("v"), cuts, desc).as("b"))
        .collect().map(_.getInt(0)).toSeq
      val want = vals.map(v => BandOfExpr.band(v, cuts, desc))
      assert(got == want, s"desc=$desc: $got vs $want")
      // interpreted twin, standalone eval
      vals.foreach { v =>
        val e = BandOfExpr(
          org.apache.spark.sql.catalyst.expressions.Literal(v), cuts, desc)
        assert(e.eval(org.apache.spark.sql.catalyst.InternalRow.empty) ==
          BandOfExpr.band(v, cuts, desc))
      }
    }
    // null child stays null
    val n = Seq[java.lang.Double](null).toDF("v")
      .select(BandExprs.bandOf(col("v"), cuts, desc = false)).head()
    assert(n.isNullAt(0))
  }

  // --- the exact form's scale guard ---

  test("exact ensemble trips loudly when the frame exceeds maxRows") {
    val e = intercept[IllegalArgumentException] {
      TextQueries.qualityEnsemble(spark, sf001, maxRows = 10L)
    }
    assert(e.getMessage.contains("maxRows=10"), e.getMessage)
    assert(e.getMessage.contains("quality_ensemble_gk"),
      s"guard must name the GK-digest route: ${e.getMessage}")
  }

  // --- GK envelope vs the exact form ---

  test("band fractions track the exact strict-cdf rank within 2/B + 2eps (+1/n)") {
    val bands = 128
    val eps = 0.002
    val exact = TextQueries.qualityEnsemble(spark, sf001).collect()
      .map(r => r.getLong(0) -> r).toMap
    val gk = TextQueries.qualityEnsembleGk(spark, sf001, bands, eps)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(gk.keySet == exact.keySet)
    val n = exact.size.toDouble
    val tol = 2.0 / bands + 2 * eps + 1.0 / n
    // the exact form's rank column gives (rank − 1)/n = fraction of docs
    // strictly better OR tied-earlier; the band fraction counts strictly
    // better only, so the two agree within tol plus the signal's tie
    // mass. quality/flesch/nll are effectively continuous on this
    // fixture; rep2 can tie (many zero-repetition docs), so its slack is
    // measured from the data.
    def check(pctIdx: Int, rankIdx: Int, tieSlack: Double): Unit =
      exact.foreach { case (id, er) =>
        val pct = gk(id).getDouble(pctIdx)
        val rankFrac = (er.getLong(rankIdx) - 1).toDouble / n
        assert(math.abs(pct - rankFrac) <= tol + tieSlack,
          s"doc $id col $pctIdx: pct=$pct rank-frac=$rankFrac tol=$tol")
      }
    val repTie = SparkEntry.queries("q_repetition")(spark, sf001)
      .groupBy(col("rep2")).count().agg(max("count")).head()
      .getLong(0).toDouble / n
    check(1, 1, 0.0) // quality
    check(2, 2, 0.0) // flesch
    check(3, 3, repTie) // rep2 (tied values share a band)
    check(4, 4, 0.0) // nll
  }

  test("curriculum GK deciles stay inside the exact ntile envelope") {
    val exact = SparkEntry.queries("q_curriculum_grid")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val gk = SparkEntry.queries("q_curriculum_grid_gk")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val n = exact.values.sum
    assert(gk.values.sum == n, "grid must cover every document")
    // per-decile population: ntile gives n/10 ± 1 by construction; the
    // GK bands may shift boundary docs by the digest guarantee + ties
    val tol = math.max(3L, n / 10)
    (1L to 10L).foreach { d =>
      val e = exact.collect { case ((dd, _), c) if dd == d => c }.sum
      val g = gk.collect { case ((dd, _), c) if dd == d => c }.sum
      assert(math.abs(e - g) <= tol, s"decile $d: exact $e vs gk $g")
    }
    // joint cells drift only by the same boundary docs
    (exact.keySet ++ gk.keySet).foreach { k =>
      assert(math.abs(exact.getOrElse(k, 0L) - gk.getOrElse(k, 0L)) <= tol,
        s"cell $k")
    }
  }

  test("keep cut lands near the exact 60% line and agrees on the clear middle") {
    val exact = TextQueries.qualityEnsemble(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    val gk = TextQueries.qualityEnsembleGk(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    val n = exact.size
    val kept = gk.values.count(identity)
    val exactKept = exact.values.count(identity)
    // the GK cut may differ by the digest guarantee + mean-pct tie mass
    assert(math.abs(kept - exactKept) <= math.max(2, (0.15 * n).toInt),
      s"gk kept $kept vs exact $exactKept of $n")
    val agree = exact.keys.count(id => exact(id) == gk(id))
    assert(agree >= (0.8 * n).toInt, s"agreement $agree/$n")
  }
}
