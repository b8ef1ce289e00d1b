package graft

import org.apache.spark.sql.functions._
import graft.operators.TextClean

/** Clean-chain semantics pinned to /root/reference/preprocessing.py:93-108. */
class TextCleanSpec extends SparkSpec {
  import spark.implicits._

  private def cleanOne(s: String): String =
    Seq(s).toDF("text").select(TextClean.cleanText($"text")).as[String].head()

  test("strips mentions, urls, hashtags, punctuation; collapses whitespace") {
    assert(cleanOne("@user check https://t.co/x #cool!!") === "check cool")
    assert(cleanOne("Hello   WORLD!!! 123") === "hello world")
    assert(cleanOne("no-change plain text") === "no change plain text")
    assert(cleanOne("http://a.b/c and https://x.y?z=1 done") === "and done")
    assert(cleanOne("@a @b_ @C9 tail") === "tail")
    assert(cleanOne("#tag1 #tag2 body") === "tag tag body") // '#' removed, digits→space
    assert(cleanOne("  padded  ") === "padded")
  }

  test("label normalization 0/4 -> 0/1") {
    val out = Seq(0, 4, 0, 4).toDF("sentiment")
      .select(TextClean.normalizeLabel($"sentiment").as("label"))
      .as[Int].collect().toSeq
    assert(out === Seq(0, 1, 0, 1))
  }

  test("clean() drops rows whose cleaned text is empty and adds text_length") {
    val df = Seq((1L, "@only_mention"), (2L, "keep me"), (3L, "123 456 !!"))
      .toDF("doc_id", "text")
    val rows = TextClean.clean(df).select($"doc_id", $"text", $"text_length")
      .as[(Long, String, Long)].collect()
    assert(rows.map(_._1).toSet === Set(2L))
    assert(rows.head._2 === "keep me" && rows.head._3 === 7L)
  }

  test("redact replaces each PII kind with its typed placeholder") {
    def redactOne(s: String): String =
      Seq(s).toDF("t").select(TextClean.redact($"t")).head().getString(0)
    assert(redactOne("mail me at jo.smith+x@corp.example.co today")
      === "mail me at <EMAIL> today")
    assert(redactOne("see https://a.example.org/p?q=1#frag now")
      === "see <URL> now")
    assert(redactOne("host 192.168.001.1 down") === "host <IP> down")
    assert(redactOne("call +1 (555) 010-4567 ok") === "call <PHONE> ok")
    // order contract: the dotted quad is redacted as an IP, not eaten by
    // the phone pattern; URL userinfo never leaks an email match
    assert(redactOne("ping 10.0.0.1 or https://u%40h@x.example.com/a")
      === "ping <IP> or <URL>")
    assert(redactOne("clean text stays clean") === "clean text stays clean")
  }

  test("clean chain is a single narrow stage (no shuffle in plan)") {
    val plan = TextClean.clean(
      Tables.documents(spark, sf001)).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("q_char_entropy: empty docs emit no rows (sequence(1,0) descends)") {
    // Spark's sequence(1, 0) yields [1, 0] — two phantom '' characters —
    // while the DuckDB mirror's generate_series(1, 0) emits nothing; the
    // query must filter empty docs out so both engines agree.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-chent").toString
    Seq((1L, "aaaa", "en", "web", 4L), (2L, "", "en", "web", 0L),
        (3L, "abab", "en", "web", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_char_entropy")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, n, k, e) => id -> ((n, k, e)) }.toMap
    assert(!got.contains(2L), s"empty doc produced phantom rows: $got")
    assert(got(1L) === ((4L, 1L, 0L)))         // single-class: entropy 0
    // two classes, uniform: entropy = ln 2 on the nano grid
    assert(got(3L) === ((4L, 2L, math.round(math.log(2.0) * 1e9))))
  }

  private def stripOne(s: String): String =
    Seq(s).toDF("t").select(TextClean.stripHtml($"t")).head().getString(0)

  test("stripHtml removes script/style/comment blocks wholesale") {
    assert(stripOne("a<script>var x = 1 < 2;</script>b") === "a b")
    assert(stripOne("a<style>p { x: '>' }</style>b") === "a b")
    assert(stripOne("a<!-- <b>hidden</b> -->b") === "a b")
    assert(stripOne("a<SCRIPT SRC=\"x.js\">y</sCrIpT>b") === "a b")
    // unclosed block: only the open tag goes (documented limit)
    assert(stripOne("a<script>leaks") === "a leaks")
  }

  test("stripHtml turns block tags into newlines, inline tags into spaces") {
    assert(stripOne("<h1>Title</h1><p>one</p><p>two</p>")
      === "Title\none\ntwo")
    assert(stripOne("x<b>bold</b>y<br/>z") === "x bold y\nz")
    // <pre> is NOT a block tag and must not match the 'p' alternative
    assert(stripOne("<pre>code</pre>") === "code")
    assert(stripOne("<!DOCTYPE html><div class=\"a\">d</div>") === "d")
    // a bare '<' that is not tag syntax survives
    assert(stripOne("1 < 2 and 3 > 2") === "1 < 2 and 3 > 2")
  }

  test("stripHtml entity policy: decode set, angle-to-space, catch-all") {
    assert(stripOne("fish &amp; chips") === "fish & chips")
    assert(stripOne("&quot;q&quot; &apos;a&apos; &#39;b&#39;")
      === "\"q\" 'a' 'b'")
    assert(stripOne("x&nbsp;y") === "x y")
    // &lt;/&gt; become spaces, never live syntax
    assert(stripOne("&lt;script&gt;alert()&lt;/script&gt;")
      === "script alert() /script")
    // numeric + unknown entities drop to a space
    assert(stripOne("a&#169;b &unknown; c&#xA9;d") === "a b c d")
    // single-pass decode: '&amp;lt;' is one layer deeper than '&lt;' —
    // the re-formed '&lt;' is caught by the catch-all (dropped), never
    // re-decoded to a live '<'
    assert(stripOne("&amp;lt;b&amp;gt;") === "b")
  }

  test("stripHtml is idempotent (fixpoint) on adversarial inputs") {
    val cases = Seq(
      "<p>plain</p>", "&amp;lt;b&amp;gt;", "&amp;amp;", "a < b > c",
      "<script>x</script>&lt;script&gt;y&lt;/script&gt;",
      "x<div>y</div>&#60;div&#62;z", "&amp;nbsp;", "<&lt;b>",
      "  <h1>pad</h1>  \n\n tail \r\n", "&&amp;x;", "<a&#98;>t</a>")
    val once = cases.toDF("t").select(TextClean.stripHtml($"t").as("o"))
    val twice = once.select(TextClean.stripHtml($"o"))
      .as[String].collect().toSeq
    assert(twice === once.as[String].collect().toSeq)
  }

  test("stripHtml is a single narrow stage (no shuffle in plan)") {
    val plan = Tables.documents(spark, sf001)
      .select(TextClean.stripHtml($"text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  private def luhnOne(s: String): Boolean =
    Seq(s).toDF("pan").select(TextClean.luhnValid($"pan")).as[Boolean].head()

  test("luhn checksum accepts the published test PANs and rejects off-by-one") {
    assert(luhnOne("4111111111111111"))   // Visa test number
    assert(luhnOne("5500005555555559"))   // Mastercard test number
    assert(luhnOne("378282246310005"))    // Amex test number (15 digits)
    assert(luhnOne("79927398713"))        // the ISO/IEC 7812 worked example
    assert(!luhnOne("4111111111111112"))
    assert(!luhnOne("79927398710"))
  }

  test("cardScan redacts only Luhn-valid candidates, counts both") {
    val t = "pay 4111 1111 1111 1111 ref 4111-1111-1111-1112 done"
    val (c, v, r) = TextClean.cardScan($"text")
    val got = Seq(t).toDF("text")
      .select(size(c).as("nc"), size(v).as("nv"), r.as("red"))
      .as[(Int, Int, String)].head()
    assert(got._1 == 2 && got._2 == 1)
    assert(got._3 == "pay <CARD> ref 4111-1111-1111-1112 done")
  }

  test("cardScan leaves candidate-free and short-run text untouched") {
    // 12 digits is below the candidate floor; 20 contiguous digits only
    // ever yields a 19-digit (Luhn-agreed) sub-candidate, never a card
    val t = "order 123456789012 hash 11111111111111111111 ok"
    val (c, v, r) = TextClean.cardScan($"text")
    val got = Seq(t).toDF("text")
      .select(size(c).as("nc"), size(v).as("nv"), r.as("red"))
      .as[(Int, Int, String)].head()
    assert(got._2 == 0 && got._3 == t)
  }

  test("cardScan is a single narrow stage (no shuffle in plan)") {
    val (c, v, r) = TextClean.cardScan($"text")
    val plan = Tables.documents(spark, sf001)
      .select(c, v, r)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
