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
}
