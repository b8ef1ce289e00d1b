package graft

import org.apache.spark.sql.functions._
import graft.operators.Drift

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def ks(rows: Seq[(String, Long)]): (Long, Long, Double, Long) =
    Drift.ksStatistic(rows.toDF("s", "v"), $"s", $"v", "a", "b")
      .as[(Long, Long, Double, Long)].head()

  test("ksStatistic == driver brute-force ECDF gap on real events") {
    val ev = Tables.events(spark, sf001)
      .select($"event_type", graft.functions.Money.cents($"value").as("c"))
      .as[(String, Long)].collect()
    val xa = ev.collect { case ("click", v) => v }.sorted
    val xb = ev.collect { case ("purchase", v) => v }.sorted
    val support = (xa ++ xb).distinct.sorted
    val want = support.map { v =>
      val ca = xa.count(_ <= v).toLong
      val cb = xb.count(_ <= v).toLong
      math.abs(ca * xb.length - cb * xa.length)
    }.max.toDouble / (xa.length.toLong * xb.length)
    val got = Drift.ksStatistic(
      Tables.events(spark, sf001).select($"event_type",
        graft.functions.Money.cents($"value").as("c")),
      $"event_type", $"c", "click", "purchase")
      .as[(Long, Long, Double, Long)].head()
    assert(got._1 === xa.length.toLong && got._2 === xb.length.toLong)
    assert(math.abs(got._3 - want) < 5e-7, s"got ${got._3}, want $want")
  }

  test("identical slices score 0; disjoint slices score 1") {
    val same = (1L to 100L).flatMap(v => Seq(("a", v), ("b", v)))
    assert(ks(same)._3 === 0.0)
    val disjoint = (1L to 50L).map(("a", _)) ++ (51L to 100L).map(("b", _))
    assert(ks(disjoint)._3 === 1.0)
  }

  test("a planted location shift is detected at the boundary") {
    // b = a + 100: D = 1 at the gap between supports; ks_at = max(a)
    val shifted = (1L to 50L).map(("a", _)) ++ (101L to 150L).map(("b", _))
    val (_, _, d, at) = ks(shifted)
    assert(d === 1.0)
    assert(at === 50L, s"max gap should first be attained at 50, got $at")
  }

  test("gap ties resolve to the smallest value") {
    // a={1}, b={3}: gap=1·1 at v=1 and v=2... grid only holds observed
    // values, so v in {1,3}; gap at 1 is 1, at 3 is 0 -> at=1
    val (_, _, d, at) = ks(Seq(("a", 1L), ("b", 3L)))
    assert(d === 1.0 && at === 1L)
  }

  test("ksByPartition == driver brute force per partition vs global") {
    val rows = Seq(
      // d1 mirrors the global mix (half low, half high); d2 is shifted
      // entirely right — d2 must read as more drifted than d1
      ("d1", 1L), ("d1", 2L), ("d1", 100L), ("d1", 101L),
      ("d2", 100L), ("d2", 101L), ("d2", 102L),
      ("d3", 1L), ("d3", 100L))
    val got = Drift.ksByPartition(rows.toDF("p", "v"), $"p", $"v")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val all = rows.map(_._2)
    val support = all.distinct.sorted
    val want = rows.groupBy(_._1).map { case (p, es) =>
      val xs = es.map(_._2)
      val d = support.map { v =>
        val cd = xs.count(_ <= v).toLong
        val cg = all.count(_ <= v).toLong
        math.abs(cd * all.length - cg * xs.length)
      }.max
      p -> ((xs.length.toLong,
        BigDecimal(d.toDouble / (xs.length.toLong * all.length))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    assert(got === want)
    // the shifted partition must read as the most drifted
    assert(got("d2")._2 > got("d1")._2)
  }

  private def psiOf(rows: Seq[(String, Long)],
      floor: Double = 1e-6): (Long, Long, Long, Double) =
    Drift.psi(rows.toDF("s", "k"), $"s", $"k", "a", "b", floor)
      .as[(Long, Long, Long, Double)].head()

  test("psi: zero shift scores exactly 0") {
    val same = (1L to 20L).flatMap(k =>
      Seq.fill(3)(("a", k)) ++ Seq.fill(3)(("b", k)))
    val (na, nb, nk, psi) = psiOf(same)
    assert((na, nb, nk) === ((60L, 60L, 20L)))
    assert(psi === 0.0)
  }

  test("psi: scale invariance — proportions, not counts") {
    // b has 10x a's rows but the SAME distribution: still exactly 0
    val rows = (1L to 5L).flatMap(k =>
      Seq.fill(2)(("a", k)) ++ Seq.fill(20)(("b", k)))
    assert(psiOf(rows)._4 === 0.0)
  }

  test("psi: disjoint support hits the floored maximum, brute-force exact") {
    val rows = (1L to 4L).map(("a", _)) ++ (11L to 14L).map(("b", _))
    val (_, _, nk, psi) = psiOf(rows)
    assert(nk === 8L)
    // brute force with the documented floor: each bucket has p=0.25 on
    // one side and the 1e-6 floor on the other
    val term = (0.25 - 1e-6) * math.log(0.25 / 1e-6)
    val want = BigDecimal(8 * math.round(term * 1e9) / 1e9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(psi === want, s"got $psi want $want")
    // well past every scorecard's 0.25 'drifted' line
    assert(psi > 0.25)
  }

  test("psi == driver brute force on real events (click vs purchase)") {
    val ev = Tables.events(spark, sf001)
      .select($"event_type",
        graft.functions.Money.cents($"value").as("c"))
      .as[(String, Long)].collect()
      .collect { case (s, c) if s == "click" || s == "purchase" =>
        (s, Math.floorDiv(c, 1000L)) }
    val na = ev.count(_._1 == "click").toDouble
    val nb = ev.count(_._1 == "purchase").toDouble
    val buckets = ev.map(_._2).distinct
    val want = buckets.map { k =>
      val pe = math.max(ev.count(e => e._1 == "click" && e._2 == k) / na, 1e-6)
      val pa = math.max(ev.count(e => e._1 == "purchase" && e._2 == k) / nb, 1e-6)
      math.round((pa - pe) * math.log(pa / pe) * 1e9)
    }.sum / 1e9
    val got = Drift.psi(
      Tables.events(spark, sf001).select($"event_type",
        (graft.functions.Money.cents($"value")
          - pmod(graft.functions.Money.cents($"value"), lit(1000L)))
          .divide(lit(1000L)).cast("long").as("k")),
      $"event_type", $"k", "click", "purchase")
      .as[(Long, Long, Long, Double)].head()
    assert(got._1.toDouble === na && got._2.toDouble === nb)
    assert(got._3 === buckets.length.toLong)
    assert(math.abs(got._4 - want) < 5e-7, s"got ${got._4}, want $want")
  }

  test("psi rejects a nonsensical floor loudly") {
    val e = intercept[IllegalArgumentException] { psiOf(Seq(("a", 1L)), 0.0) }
    assert(e.getMessage.contains("floor"))
  }

  test("psiByPartition == driver brute force; shifted day reads highest") {
    val rows = Seq(
      // d1 mirrors the global mix; d2 sits entirely in the high buckets
      ("d1", 1L), ("d1", 2L), ("d1", 10L), ("d1", 11L),
      ("d2", 10L), ("d2", 11L), ("d2", 12L),
      ("d3", 1L), ("d3", 10L))
    val got = Drift.psiByPartition(rows.toDF("p", "k"), $"p", $"k")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val buckets = rows.map(_._2).distinct.sorted
    val ng = rows.size.toDouble
    val want = rows.groupBy(_._1).map { case (p, es) =>
      val np = es.size.toDouble
      val psi = buckets.map { k =>
        val pe = math.max(rows.count(_._2 == k) / ng, 1e-6)
        val pa = math.max(es.count(_._2 == k) / np, 1e-6)
        math.round((pa - pe) * math.log(pa / pe) * 1e9)
      }.sum / 1e9
      p -> ((es.size.toLong, buckets.size.toLong,
        BigDecimal(psi).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble))
    }
    assert(got === want)
    assert(got("d2")._3 > got("d1")._3, "the shifted day must score higher")
  }

  test("psiByPartition dense-grid guard trips loudly") {
    val rows = (1L to 100L).map(v => (s"p$v", v))
    val e = intercept[IllegalArgumentException] {
      Drift.psiByPartition(rows.toDF("p", "k"), $"p", $"k",
        maxCells = 50L).count()
    }
    assert(e.getMessage.contains("dense grid") &&
      e.getMessage.contains("budget 50"))
  }

  test("ksByPartition dense-grid guard trips loudly and names the budget") {
    val rows = (1L to 100L).map(v => (s"p$v", v))
    val e = intercept[IllegalArgumentException] {
      Drift.ksByPartition(rows.toDF("p", "v"), $"p", $"v",
        maxCells = 50L).count()
    }
    assert(e.getMessage.contains("dense grid"))
    assert(e.getMessage.contains("budget 50"),
      s"guard must name the budget it enforces: ${e.getMessage}")
  }

  test("ksByPartition default budget bounds the single-task global sort") {
    // the global cumulative window is one unpartitioned sort task; the
    // DEFAULT budget must stay ~1e6 cells so nobody inherits a 1e8-cell
    // single-thread sort by omission (raising it is a deliberate act)
    val m = Drift.getClass.getMethods
      .find(_.getName == "ksByPartition$default$4")
    assert(m.map(_.invoke(Drift)) === Some(1000000L),
      "ksByPartition maxCells default must be 1e6")
  }
}
