package graft

import org.apache.spark.sql.functions._
import graft.operators.{LangId, TokenOps}

class TokenOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenize lowercases and splits on whitespace runs") {
    val out = Seq("Hello  WORLD\tfoo").toDF("text")
      .select(TokenOps.tokenize($"text")).as[Seq[String]].head()
    assert(out === Seq("hello", "world", "foo"))
  }

  test("removeStopwords preserves order and duplicates") {
    val out = Seq("the cat the hat a cat").toDF("text")
      .select(TokenOps.removeStopwords(TokenOps.tokenize($"text")))
      .as[Seq[String]].head()
    assert(out === Seq("cat", "hat", "cat"))
  }

  test("stoplist is the 181-word MLlib default") {
    assert(TokenOps.englishStopwords.size === 181)
    assert(TokenOps.englishStopwords.contains("the"))
    assert(TokenOps.englishStopwords.contains("don't")) // apostrophe → SQL escaping matters
  }

  test("bag-of-words fingerprint is word-order invariant") {
    val fps = Seq("b a c", "c b a", "a b d").toDF("text")
      .select(TokenOps.bagOfWordsFingerprint($"text")).as[String].collect()
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("bpe pretokenizer counts contractions, numbers, punct runs") {
    def countOne(s: String): Long =
      Seq(s).toDF("t").select(TokenOps.bpeTokenCount($"t")).head().getLong(0)
    // "Hello" " world" "," " don" "'t" " stop" -> 6
    assert(countOne("Hello world, don't stop") === 6L)
    // " ?\p{N}+ splits digits from letters: "abc" "123" "!!" -> 3
    assert(countOne("abc123!!") === 3L)
    assert(countOne("") === 0L)
    // unicode letters count as letter runs, not punctuation
    assert(countOne("naïve übermut") === 2L)
  }

  test("langid detects obvious languages and falls back to und") {
    val rows = Seq(
      "the quick brown fox jumps over the lazy dog and it is fast",
      "der hund ist nicht mit der katze und ich bin zu haus",
      "le chat est dans la maison et les enfants sont pour vous",
      "el perro no se corre por la calle y en un parque",
      "zzz qqq xxx").toDF("text")
      .select(LangId.detectText($"text")).as[String].collect().toSeq
    assert(rows === Seq("en", "de", "fr", "es", "und"))
  }

  test("quality score is in [0,1] and penalizes stopword soup") {
    val df = Seq(
      ("all content words here machine learning distributed systems", 1),
      ("the and of to in is you that it for", 2)).toDF("text", "id")
    val (n, sr, q) = TokenOps.qualityScore($"text")
    val out = df.select($"id", q.as("q")).as[(Int, Double)].collect().toMap
    assert(out.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(out(1) > out(2), s"content-heavy doc should outscore stopword soup: $out")
  }

  test("gopher rules: clean prose passes, degenerate docs fail the right rule") {
    val df = Seq(
      // 1: clean 12-token prose -> pass
      ("the quick brown fox jumps over the lazy dog near the river", 1),
      // 2: too short
      ("tiny doc", 2),
      // 3: symbol soup (# ratio blows the 0.1 budget)
      ("# # # # # tag tag tag tag tag tag tag", 3),
      // 4: numeric soup fails the alpha-word share
      ("11 22 33 44 55 66 77 88 99 00 11 22", 4)).toDF("text", "id")
    val out = df.select($"id", TokenOps.gopherRules($"text").as("g"))
      .select($"id", $"g.pass", $"g.n_tokens", $"g.alpha_ratio",
        $"g.symbol_ratio")
      .as[(Int, Boolean, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1)._2 === true, out(1))
    assert(out(2)._2 === false && out(2)._3 < 10, out(2))
    assert(out(3)._2 === false && out(3)._5 > 0.1, out(3))
    assert(out(4)._2 === false && out(4)._4 < 0.7, out(4))
  }
}
