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

  test("clean chain is a single narrow stage (no shuffle in plan)") {
    val plan = TextClean.clean(
      Tables.documents(spark, sf001)).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
