package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Dedup, TextClean, TokenOps}

/** ScalaCheck-generator property tests (SURVEY.md §5.3): invariants over
  * generated inputs, run through the real engine. Generators are sampled
  * with fixed seeds (deterministic CI) via plain scalacheck — the
  * scalatestplus bridge isn't among the resolvable offline deps. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.listOf(word).map(_.mkString(" "))

  test("clean chain output contains only lowercase letters and single spaces") {
    val raw = sample(Gen.listOfN(40, Gen.oneOf(
      text, Gen.const("@user##"), Gen.const("https://x.co/y z"),
      Gen.const("MiXeD 123 CaSe!!"), Gen.const("  padded\t\ttabs  "))), 1L)
    val out = raw.toDF("text")
      .select(TextClean.cleanText($"text")).as[String].collect()
    out.foreach { s =>
      assert(s.matches("[a-z ]*"), s"illegal chars in '$s'")
      assert(!s.contains("  "), s"uncollapsed whitespace in '$s'")
      assert(s == s.trim, s"untrimmed: '$s'")
    }
  }

  test("tokenize: joining tokens with single spaces reproduces the text") {
    (1L to 20L).foreach { seed =>
      val ws = sample(Gen.nonEmptyListOf(word), seed)
      val t = ws.mkString(" ")
      val toks = Seq(t).toDF("text")
        .select(TokenOps.tokenize($"text")).as[Seq[String]].head()
      assert(toks.mkString(" ") === t)
      assert(toks.forall(w => !w.exists(_.isWhitespace)))
    }
  }

  test("dedup idempotence and survivor-minimality on generated keyed data") {
    val rows = sample(Gen.listOfN(60,
      for { k <- Gen.choose(0, 9); id <- Gen.choose(0L, 999L) }
        yield (id, s"k$k")), 7L).distinct
    val df = rows.toDF("id", "k")
    val once = Dedup.exact(df, Seq("k"), $"id")
    val twice = Dedup.exact(once, Seq("k"), $"id")
    assert(once.collect().toSet === twice.collect().toSet)
    val survivors = once.as[(Long, String)].collect().toMap
      .map { case (id, k) => k -> id }
    val minima = rows.groupBy(_._2).map { case (k, g) => k -> g.map(_._1).min }
    assert(survivors === minima)
  }

  test("exact-cents sum equals a BigDecimal ledger on generated 2dp amounts") {
    (1L to 10L).foreach { seed =>
      val xs = sample(Gen.nonEmptyListOf(
        Gen.choose(0, 5000000).map(_ / 100.0)), seed)
      val got = xs.toDF("v")
        .agg(sum(round($"v" * 100, 0).cast("long")).cast("double") / 100.0)
        .as[Double].head()
      val expected = xs.map(v => BigDecimal(v).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      assert(got === expected, s"cents sum drift (seed $seed)")
    }
  }
}
