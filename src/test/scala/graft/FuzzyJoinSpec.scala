package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

/** The prefix-filter edit-distance join must equal the brute-force O(n²)
  * join — the blocking is exact, not approximate. Edge cases target the
  * lemma's boundaries: zero-gram-overlap short strings, duplicated grams
  * (multiset counting), and the length filter.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], d: Int) = {
    val df = rows.toDF("id", "s")
    val got = FuzzyJoin.editDistancePairs(df, "id", "s", d)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSeq
    val want = FuzzyJoin.bruteForcePairs(df, "id", "s", d)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSeq
    (got, want)
  }

  test("equals brute force on real part names (sf0.001, d=2)") {
    val part = Tables.part(spark, sf001).select(
      col("p_partkey").as("id"), col("p_name").as("s"))
    val got = FuzzyJoin.editDistancePairs(part, "id", "s", 2)
      .orderBy("id_a", "id_b").as[(Long, Long, Long)].collect().toSeq
    val want = FuzzyJoin.bruteForcePairs(part, "id", "s", 2)
      .orderBy("id_a", "id_b").as[(Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty, "expected at least one fuzzy match in part names")
    assert(got == want)
  }

  test("zero-gram-overlap short pairs are still found (degenerate bucket)") {
    // "ab" vs "cd": ed=2, sharing no padded bigram — the count filter is
    // vacuous here; only the short bucket can find it. "xay" vs "uav"
    // (ed=2, shared middle char, zero shared grams) likewise.
    val (got, want) = run(
      Seq((1L, "ab"), (2L, "cd"), (3L, "xay"), (4L, "uav")), 2)
    assert(want.contains((1L, 2L, 2L)) && want.contains((3L, 4L, 2L)))
    assert(got == want)
  }

  test("duplicated grams count as a multiset, not a set") {
    // "aaaa" vs "aa": every gram is "aa"/padded — distance 2 (2 deletes).
    // "aaaa" vs "bbbb": distance 4, must NOT appear at d=2 even though
    // both collapse to one distinct gram each.
    val (got, want) = run(
      Seq((1L, "aaaaaa"), (2L, "aaaa"), (3L, "bbbbbb"), (4L, "caaaaad")), 2)
    assert(got == want)
    assert(got.contains((1L, 2L, 2L)) && got.contains((1L, 4L, 2L)))
    assert(!got.exists(p => p._1 == 1L && p._2 == 3L))
  }

  test("length filter: |len diff| > d pairs never verify") {
    val (got, want) = run(Seq((1L, "abcdefgh"), (2L, "abc"), (3L, "abcdefg")), 2)
    assert(got == want)
    assert(got.contains((1L, 3L, 1L)) && !got.exists(p => p._1 == 1L && p._2 == 2L))
  }

  test("the short-bucket guard trips loudly on a degenerate corpus") {
    val tiny = (0L until 50L).map(i => (i, "a" + (i % 9))).toDF("id", "s")
    val e = intercept[IllegalArgumentException] {
      FuzzyJoin.editDistancePairs(tiny, "id", "s", 2, maxShortRows = 10L).count()
    }
    assert(e.getMessage.contains("degenerate bucket"))
    // and the explicit opt-in works, matching brute force
    val got = FuzzyJoin.editDistancePairs(tiny, "id", "s", 2, maxShortRows = 100L)
      .orderBy("id_a", "id_b").as[(Long, Long, Long)].collect().toSeq
    val want = FuzzyJoin.bruteForcePairs(tiny, "id", "s", 2)
      .orderBy("id_a", "id_b").as[(Long, Long, Long)].collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("randomized corpora: prefix filter == brute force for d in 1..3") {
    // Deterministic ScalaCheck sampling (the PropertySpec convention):
    // small alphabets force heavy gram collisions, duplicates, and
    // boundary lengths — the regimes where a blocking bug would hide.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val word = for {
      n <- Gen.choose(0, 8)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    for (seed <- 1L to 4L; d <- 1 to 3) {
      val strs = sample(Gen.listOfN(60, word), seed * 31 + d)
      val rows = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val (got, want) = run(rows, d)
      assert(got == want, s"seed=$seed d=$d: got ${got.size} want ${want.size}")
    }
  }

  test("deletion-neighborhood join == brute force at d=1 (FastSS)") {
    // real fixed-format names plus randomized corpora: the three d=1
    // collision cases (identity, insertion, same-position substitution)
    // and the near-miss hamming-2 non-collisions
    val cust = Tables.customer(spark, sf001).select(
      col("c_custkey").as("id"), col("c_name").as("s"))
    val got = graft.operators.FuzzyJoin
      .deletionNeighborhoodPairs(cust, "id", "s")
      .orderBy("id_a", "id_b").as[(Long, Long, Long)].collect().toSeq
    val want = graft.operators.FuzzyJoin.bruteForcePairs(cust, "id", "s", 1)
      .orderBy("id_a", "id_b").as[(Long, Long, Long)].collect().toSeq
    assert(got == want && got.nonEmpty)
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val word = for {
      n <- Gen.choose(0, 6)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b'))
    } yield cs.mkString
    for (seed <- 1L to 3L) {
      val rows = sample(Gen.listOfN(50, word), seed)
        .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
      val g = graft.operators.FuzzyJoin
        .deletionNeighborhoodPairs(rows, "id", "s")
        .orderBy("id_a", "id_b").as[(Long, Long, Long)].collect().toSeq
      val w = graft.operators.FuzzyJoin.bruteForcePairs(rows, "id", "s", 1)
        .orderBy("id_a", "id_b").as[(Long, Long, Long)].collect().toSeq
      assert(g == w, s"seed=$seed")
    }
  }

  test("deletion-neighborhood join == brute force at d=2 (FastSS d=2)") {
    // real names at d=2 plus randomized small-alphabet corpora — the
    // regimes where the 2-deletion intersection argument must hold for
    // substitution+substitution, insert+delete, and mixed edits.
    val part = Tables.part(spark, sf001).select(
      col("p_partkey").as("id"), col("p_name").as("s"))
    val got = FuzzyJoin.deletionNeighborhoodPairs(part, "id", "s", maxDist = 2)
      .orderBy("id_a", "id_b").as[(Long, Long, Long)].collect().toSeq
    val want = FuzzyJoin.bruteForcePairs(part, "id", "s", 2)
      .orderBy("id_a", "id_b").as[(Long, Long, Long)].collect().toSeq
    assert(got == want && got.nonEmpty)
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val word = for {
      n <- Gen.choose(0, 6)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b'))
    } yield cs.mkString
    for (seed <- 1L to 3L) {
      val rows = sample(Gen.listOfN(50, word), seed)
        .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
      val g = FuzzyJoin.deletionNeighborhoodPairs(rows, "id", "s", maxDist = 2)
        .orderBy("id_a", "id_b").as[(Long, Long, Long)].collect().toSeq
      val w = FuzzyJoin.bruteForcePairs(rows, "id", "s", 2)
        .orderBy("id_a", "id_b").as[(Long, Long, Long)].collect().toSeq
      assert(g == w, s"seed=$seed")
    }
  }

  test("FastSS d=2 key-volume guard trips loudly; d=3 refused by contract") {
    val rows = (0L until 100L)
      .map(i => (i, "abcdefghijklmnopqrst" + i)).toDF("id", "s")
    // 100 strings of length ~22 → ~25k keys; a 1k budget must trip.
    val e = intercept[IllegalArgumentException] {
      FuzzyJoin.deletionNeighborhoodPairs(rows, "id", "s", maxDist = 2,
        maxKeyRows = 1000L).count()
    }
    assert(e.getMessage.contains("deletion keys"))
    val e3 = intercept[IllegalArgumentException] {
      FuzzyJoin.deletionNeighborhoodPairs(rows, "id", "s", maxDist = 3).count()
    }
    assert(e3.getMessage.contains("editDistancePairs"))
  }

  test("pad-sentinel-bearing input fails fast instead of dropping pairs") {
    val rows = Seq((1L, "widget"), (2L, "wid\u0001get"), (3L, "gadget"))
      .toDF("id", "s")
    val e = intercept[IllegalArgumentException] {
      FuzzyJoin.editDistancePairs(rows, "id", "s", 1).count()
    }
    assert(e.getMessage.contains("sentinel"))
    // clean input still runs (the guard is a probe, not a result tax)
    val clean = Seq((1L, "widget"), (2L, "widgit")).toDF("id", "s")
    assert(FuzzyJoin.editDistancePairs(clean, "id", "s", 1).count() == 1L)
  }

  test("d=1 on typo'd tokens") {
    val (got, want) = run(Seq(
      (1L, "widget"), (2L, "widgit"), (3L, "gadget"), (4L, "widgets"),
      (5L, "small ring"), (6L, "small ping"), (7L, "large ring")), 1)
    assert(got == want)
    assert(got.contains((1L, 2L, 1L)) && got.contains((1L, 4L, 1L)) &&
      got.contains((5L, 6L, 1L)))
  }
}
