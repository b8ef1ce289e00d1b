package graft

import graft.app.Sentiment140Smoke

/** The reference-scale smoke chain at test size: same code path the
  * bench runs at 1.6M rows, here at 2k so CI proves the wiring (raw
  * generation shape, preprocess artifacts, both trainings, comparison
  * artifacts, per-stage timings). */
class SmokeSpec extends SparkSpec {

  test("Sentiment140 smoke chain end-to-end at test scale") {
    val work = java.nio.file.Files.createTempDirectory("graft-smoke-spec")
    val t = Sentiment140Smoke.run(spark, work.toString, n = 2000L)
    // every stage actually ran and was timed
    assert(t.toPairs.forall(_._2 >= 0.0))
    assert(t.total > 0.0)
    // raw corpus has the reference's 6-column headerless shape
    val raw = graft.sources.SentimentCsv.readRaw(spark, work.resolve("raw").toString)
    assert(raw.columns.toSeq ===
      Seq("sentiment", "id", "date", "query", "user", "text"))
    assert(raw.count() === 2000L)
    // cleaned output re-reads with the clean schema and kept most rows
    val clean = graft.sources.SentimentCsv.readClean(spark, work.resolve("clean").toString)
    assert(clean.columns.toSeq === Seq("label", "text"))
    assert(clean.count() > 1800L)
    // artifacts of every stage exist
    for (f <- Seq("lr_metrics.json", "nb_metrics.json", "comparison.json",
        "comparison.svg", "comparison_confusion.svg",
        "charts/label_distribution.svg", "charts/length_before_after.svg",
        "charts/lr_confusion_matrix.svg", "charts/lr_roc_curve.svg"))
      assert(java.nio.file.Files.exists(work.resolve(f)), s"missing $f")
    // the mention/URL/hashtag junk was actually cleaned out
    import spark.implicits._
    val dirty = clean.filter($"text".rlike("@user|http|#tag|!")).count()
    assert(dirty === 0L, s"$dirty rows kept uncleaned artifacts")
  }
}
