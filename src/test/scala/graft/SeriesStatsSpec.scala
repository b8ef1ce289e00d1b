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

  test("mutual information: independence = exactly 0; I(X;X) = H(X)") {
    import graft.operators.Profiling
    // counts FACTORIZE (every (x,y) cell = 6 rows, margins uniform):
    // each cell's c*n == nx*ny -> ln(1) = 0 -> MI exactly 0.0
    val indep = (for { x <- 1 to 4; y <- 1 to 3; _ <- 1 to 6 }
      yield (s"x$x", s"y$y")).toDF("a", "b")
    val (n0, k0, mi0) = Profiling.mutualInformation(indep, "a", "b")
      .as[(Long, Long, Double)].head()
    assert((n0, k0) === ((72L, 12L)))
    assert(mi0 === 0.0)
    // self-information: I(X;X) = H(X), the entropy of the marginal
    val self = (Seq.fill(6)("u") ++ Seq.fill(3)("v") ++ Seq.fill(1)("w"))
      .map(x => (x, x)).toDF("a", "b")
    val mi = Profiling.mutualInformation(self, "a", "b")
      .as[(Long, Long, Double)].head()._3
    val h = -Seq(6.0, 3.0, 1.0).map(_ / 10.0).map(p => p * math.log(p)).sum
    assert(math.abs(mi - h) < 2e-6, s"I(X;X)=$mi vs H(X)=$h")
    // dependence reads strictly above the independent landmark
    assert(mi > 0.0)
  }

  test("mutual information == driver brute force on real documents") {
    import graft.operators.Profiling
    val rows = Tables.documents(spark, sf001)
      .select($"lang", $"source").as[(String, String)].collect()
      .filter(r => r._1 != null && r._2 != null)
    val n = rows.length.toDouble
    val cells = rows.groupBy(identity).view.mapValues(_.length).toMap
    val nx = rows.groupBy(_._1).view.mapValues(_.length).toMap
    val ny = rows.groupBy(_._2).view.mapValues(_.length).toMap
    val want = cells.map { case ((x, y), c) =>
      math.round((c / n) * math.log(c * n / (nx(x).toDouble * ny(y))) * 1e9)
    }.sum / 1e9
    val got = Profiling.mutualInformation(
        Tables.documents(spark, sf001), "lang", "source")
      .as[(Long, Long, Double)].head()
    assert(got._1 === rows.length.toLong && got._2 === cells.size.toLong)
    assert(math.abs(got._3 - want) < 5e-7, s"got ${got._3}, want $want")
  }

  test("zipf slope: an exact power law reads its exponent; driver parity") {
    import graft.operators.Profiling
    // a synthetic corpus whose top tokens follow freq = round(1000/rank)
    // exactly: the fitted slope must sit near -1 (grid/rounding noise
    // only — freq quantizes to integers)
    val words = (1 to 20).flatMap { r =>
      Seq.fill(math.round(1000.0 / r).toInt)(s"w${"%02d".format(r)}")
    }
    val docs = words.grouped(50).map(_.mkString(" ")).toSeq
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val (n, slope, icpt) = Profiling.zipfSlope(docs, "text", topK = 20)
      .as[(Long, Double, Double)].head()
    assert(n === 20L)
    assert(math.abs(slope - (-1.0)) < 0.01, s"slope $slope")
    // driver brute force of the identical grid arithmetic
    val freqs = (1 to 20).map(r => math.round(1000.0 / r)).sorted.reverse
    def g(v: Double) = math.round(v * 1e9)
    val terms = freqs.zipWithIndex.map { case (f, i) =>
      val x = math.log((i + 1).toDouble); val y = math.log(f.toDouble)
      (g(x), g(y), g(x * y), g(x * x))
    }
    val (sx, sy, sxy, sxx) = (terms.map(_._1).sum, terms.map(_._2).sum,
      terms.map(_._3).sum, terms.map(_._4).sum)
    val nn = 20.0
    val wantSlope = (nn * sxy - sx.toDouble * sy.toDouble / 1e9) /
      (nn * sxx - sx.toDouble * sx.toDouble / 1e9)
    assert(slope === BigDecimal(wantSlope)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val wantIcpt = (sy / nn - wantSlope * (sx / nn)) / 1e9
    assert(math.abs(icpt - wantIcpt) < 1e-5)
    // and the real fixture reads Zipf-ish: negative, in a sane band
    val (fn, fslope, _) = Profiling
      .zipfSlope(Tables.documents(spark, sf001), "text")
      .as[(Long, Double, Double)].head()
    // the sf0.001 fixture's whole vocabulary is < topK — the cut keeps
    // what exists (31 tokens at this scale), and its SYNTHETIC text is
    // near-uniform over that vocabulary (slope ≈ −0.18): the diagnostic
    // correctly reads "not natural text" — exactly the flat-corpus flag
    // the operator exists to raise. Sanity: negative and bounded.
    assert(fn >= 20L)
    assert(fslope < 0.0 && fslope > -3.0, s"fixture slope $fslope")
  }

  test("welch t-test: identical samples = t 0; textbook case matches hand math") {
    import graft.operators.Profiling
    val same = (1 to 20).flatMap(i =>
      Seq(("a", i.toDouble), ("b", i.toDouble))).toDF("g", "v")
    val eq = Profiling.welchTTest(same, $"v", $"g", "a", "b")
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(eq._1 == 20 && eq._2 == 20)
    assert(eq._3 == eq._4 && eq._5 == 0.0)
    // a = {1,2,3,4,5} (mean 3, var 2.5), b = {2,4,6,8,10} (mean 6,
    // var 10): se2 = 2.5/5 + 10/5 = 2.5, t = -3/sqrt(2.5),
    // df = 2.5^2 / (0.5^2/4 + 2^2/4) = 6.25/1.0625
    val ab = (Seq(1, 2, 3, 4, 5).map(v => ("a", v.toDouble)) ++
      Seq(2, 4, 6, 8, 10).map(v => ("b", v.toDouble))).toDF("g", "v")
    val got = Profiling.welchTTest(ab, $"v", $"g", "a", "b")
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(got._3 == 3.0 && got._4 == 6.0)
    assert(got._5 == BigDecimal(-3.0 / math.sqrt(2.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got._6 == BigDecimal(6.25 / 1.0625)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("welch t-test presents NULL, not NaN, on degenerate arms") {
    import graft.operators.Profiling
    // single-unit arm: no sample variance exists (n−1 = 0)
    val single = Seq(("a", 3.0), ("b", 1.0), ("b", 2.0)).toDF("g", "v")
    val r1 = Profiling.welchTTest(single, $"v", $"g", "a", "b").head()
    assert(r1.getLong(0) == 1 && r1.isNullAt(4) && r1.isNullAt(5))
    // empty arm
    val empty = Seq(("b", 1.0), ("b", 2.0)).toDF("g", "v")
    val r2 = Profiling.welchTTest(empty, $"v", $"g", "a", "b").head()
    assert(r2.getLong(0) == 0 && r2.isNullAt(4) && r2.isNullAt(5))
    // zero pooled SE: both arms constant
    val const = Seq(("a", 5.0), ("a", 5.0), ("b", 7.0), ("b", 7.0))
      .toDF("g", "v")
    val r3 = Profiling.welchTTest(const, $"v", $"g", "a", "b").head()
    assert(r3.isNullAt(4) && r3.isNullAt(5))
  }

  test("welch t-test is partitioning-invariant (integer-moment sums)") {
    import graft.operators.Profiling
    val ev = Tables.events(spark, sf001)
    val a = Profiling.welchTTest(ev, $"value", $"event_type",
      "click", "purchase").collect().toSeq
    val b = Profiling.welchTTest(ev.repartition(17), $"value",
      $"event_type", "click", "purchase").collect().toSeq
    assert(a == b)
  }

  test("cuped: a purely pre-existing difference cancels; effect survives") {
    import graft.operators.Profiling
    def ev(user: Long, day: Int, v: Double) =
      (user, new java.sql.Timestamp(
        java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00").getTime), v)
    def run(ys: Map[Long, Double]) = {
      val xs = Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0, 4L -> 40.0)
      val rows = xs.toSeq.map { case (u, x) => ev(u, 10, x) } ++
        ys.toSeq.map { case (u, y) => ev(u, 20, y) }
      Profiling.cupedDiff(rows.toDF("user_id", "ts", "value"),
          $"user_id",
          concat(lit("arm"), pmod($"user_id", lit(2)).cast("string")),
          $"ts" < lit("2024-01-16").cast("timestamp"),
          $"value", "arm1", "arm0") // arm1 = odd users {1,3}, arm0 = {2,4}
        .as[(Long, Long, Double, Double, Double)].head()
    }
    // Y = 2X exactly: theta = 2 and the raw arm gap is ALL pre-period —
    // CUPED cancels it to 0
    val pure = run(Map(1L -> 20.0, 2L -> 40.0, 3L -> 60.0, 4L -> 80.0))
    assert(pure._3 == 2.0 && pure._4 == 20.0 && pure._5 == 0.0)
    // +5 planted effect on arm0 (even users): Sxy = 6300 - 5250 = 1050,
    // Sxx = 500 -> theta = 2.1; diff_raw = 65 - 40 = 25;
    // diff_cuped = 25 - 2.1*10 = 4 (the pre-existing 20 cancels, the
    // pooled-theta bias eats 1 of the planted 5 - the textbook trade)
    val eff = run(Map(1L -> 20.0, 2L -> 45.0, 3L -> 60.0, 4L -> 85.0))
    assert(eff._3 == 2.1 && eff._4 == 25.0 && eff._5 == 4.0)
    // partitioning invariance on the fixture
    import graft.Tables
    val events = Tables.events(spark, sf001)
    def fix(df: org.apache.spark.sql.DataFrame) =
      Profiling.cupedDiff(df, $"user_id",
        concat(lit("arm"), pmod($"user_id", lit(2)).cast("string")),
        $"ts" < lit("2024-01-16").cast("timestamp"),
        $"value", "arm0", "arm1").collect().toSeq
    assert(fix(events) == fix(events.repartition(17)))
  }

  test("k-anonymity: exactly the under-k groups surface, k guard trips") {
    import graft.operators.Profiling
    val rows = Seq.fill(5)(("en", "a")) ++ Seq.fill(2)(("en", "b")) ++
      Seq(("de", "a"))
    val df = rows.toDF("lang", "src")
    val got = Profiling.kAnonymityViolations(df,
        Seq($"lang", $"src"), k = 5)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("en", "b", 2L), ("de", "a", 1L)))
    // the 5-member group satisfies k = 5 (strict less-than contract)
    assert(!got.exists(g => g._1 == "en" && g._2 == "a"))
    val e = intercept[IllegalArgumentException] {
      Profiling.kAnonymityViolations(df, Seq($"lang"), k = 1)
    }
    assert(e.getMessage.contains("vacuous"))
  }

  test("readability: hand-counted flesch, fragment floors at one sentence") {
    import graft.operators.TokenOps
    def run(s: String) = {
      val (ns, nw, nsy, fl) = TokenOps.readability($"text")
      Seq(s).toDF("text").select(ns, nw, nsy, fl)
        .as[(Long, Long, Long, Double)].head()
    }
    // "the cat sat. it ran!" -> 2 sentences, 5 words,
    // syllables: the(1) cat(1) sat.(1) it(1) ran!(1) = 5
    // flesch = 206.835 - 1.015*2.5 - 84.6*1 = 119.6975
    val simple = run("the cat sat. it ran!")
    assert(simple._1 == 2 && simple._2 == 5 && simple._3 == 5)
    assert(simple._4 == BigDecimal(206.835 - 1.015 * 2.5 - 84.6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // no terminal punctuation: one sentence by the floor rule
    assert(run("just a fragment")._1 == 1)
    // polysyllabic words score lower (harder) than monosyllabic ones
    assert(run("extraordinarily complicated vocabulary manifests")._4 <
      run("the cat sat on the mat")._4)
  }

  test("proportion z-test: hand case, equal rates = 0, saturation = NULL") {
    import graft.operators.Profiling
    def mk(rows: Seq[(Long, String, Boolean)]) =
      rows.toDF("u", "g", "c")
    def run(rows: Seq[(Long, String, Boolean)]) =
      Profiling.proportionZTest(mk(rows), $"u", $"g", $"c", "a", "b")
        .as[(Long, Long, Double, Double, Option[Double])].head()
    // a: 8/10 convert, b: 4/10: pooled 0.6,
    // z = 0.4 / sqrt(0.6*0.4*(0.1+0.1))
    val hand = run(
      (1 to 10).map(i => (i.toLong, "a", i <= 8)) ++
        (11 to 20).map(i => (i.toLong, "b", i <= 14)))
    assert(hand._1 == 10 && hand._2 == 10)
    assert(hand._3 == 0.8 && hand._4 == 0.4)
    assert(hand._5.contains(BigDecimal(0.4 / math.sqrt(0.6 * 0.4 * 0.2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    // identical rates: z exactly 0
    val same = run((1 to 10).map(i => (i.toLong, "a", i % 2 == 0)) ++
      (11 to 20).map(i => (i.toLong, "b", i % 2 == 0)))
    assert(same._5.contains(0.0))
    // saturation (everyone converts): zero pooled variance, z NULL
    // instead of an ANSI divide-by-zero out of codegen
    val sat = run((1 to 4).map(i =>
      (i.toLong, if (i <= 2) "a" else "b", true)))
    assert(sat._3 == 1.0 && sat._4 == 1.0 && sat._5.isEmpty)
    // a unit with MULTIPLE rows converts if ANY row converts
    val multi = run(Seq((1L, "a", false), (1L, "a", true), (2L, "a", false),
      (3L, "b", false), (4L, "b", false)))
    assert(multi._1 == 2 && multi._3 == 0.5 && multi._4 == 0.0)
  }

  test("cohen's kappa: perfect agreement = 1, majority guessing = 0") {
    import graft.operators.Profiling
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x"), ("z", "z"))
      .toDF("t", "p")
    val k1 = Profiling.cohensKappa(perfect, "t", "p")
      .as[(Long, Double, Double, Double)].head()
    assert(k1._2 == 1.0 && k1._4 == 1.0)
    // constant prediction: po equals the majority share AND pe equals
    // the same share (r_x·n / n² = p_x) -> kappa exactly 0
    val const = Seq(("x", "x"), ("x", "x"), ("x", "x"), ("y", "x"))
      .toDF("t", "p")
    val k0 = Profiling.cohensKappa(const, "t", "p")
      .as[(Long, Double, Double, Double)].head()
    assert(k0._2 == 0.75 && k0._3 == 0.75 && k0._4 == 0.0)
  }

  test("cohen's kappa presents NULL, not NaN, when pe = 1 (single class)") {
    import graft.operators.Profiling
    val mono = Seq(("x", "x"), ("x", "x"), ("x", "x")).toDF("t", "p")
    val r = Profiling.cohensKappa(mono, "t", "p").head()
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 1.0 && r.isNullAt(3))
  }

  test("cohen's kappa matches the textbook two-rater example") {
    import graft.operators.Profiling
    // the standard worked example: 50 items, agreement 20+15=35,
    // margins a=(25,25), b=(30,20): pe = (25*30 + 25*20)/2500 = 0.5,
    // kappa = (0.7 - 0.5)/0.5 = 0.4
    val rows =
      Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
        Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val got = Profiling.cohensKappa(rows.toDF("t", "p"), "t", "p")
      .as[(Long, Double, Double, Double)].head()
    assert(got == ((50L, 0.7, 0.5, 0.4)))
  }
}
