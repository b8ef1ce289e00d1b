package graft

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.functions._
import graft.app.{Preprocess, Train}
import graft.ml.{ModelComparison, SentimentPipeline}
import graft.sources.SentimentCsv

/** The reference's full workflow chained end-to-end through the runnable
  * entry points: preprocess (raw CSV → clean CSV) → train (clean CSV →
  * metrics JSON + saved model) → compare (metrics JSONs → ranked report).
  * Mirrors `/root/reference/preprocessing.py` → `model_*.py` →
  * `compare_models.py`.
  */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  /** Raw Sentiment140-shaped fixture: sentiment 0/4, tweets built from a
    * sentiment-bearing vocabulary plus the noise the clean chain strips
    * (mentions, URLs, hashtags, punctuation). Deterministic (seed 7). */
  private lazy val rawDir: String = {
    val pos = Vector("good", "great", "excellent", "love", "wonderful", "best")
    val neg = Vector("bad", "awful", "terrible", "hate", "worst", "poor")
    val noise = Vector("the", "movie", "film", "plot", "actor", "scene")
    val junk = Vector("@someone", "https://t.co/abc", "#tag", "!!!", "123")
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      val sentiment = if (i % 2 == 0) 0 else 4
      val vocab = if (sentiment == 4) pos else neg
      val words = (0 until 10).map { _ =>
        rnd.nextInt(4) match {
          case 0 => vocab(rnd.nextInt(vocab.size))
          case 1 => vocab(rnd.nextInt(vocab.size))
          case 2 => noise(rnd.nextInt(noise.size))
          case _ => junk(rnd.nextInt(junk.size))
        }
      }
      (sentiment, s"id_$i", "Mon Apr 06 22:19:45 PDT 2009", "NO_QUERY",
        s"user_$i", words.mkString(" "))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-raw").toString
    rows.toDF("sentiment", "id", "date", "query", "user", "text")
      .coalesce(1).write.mode("overwrite").option("header", "false").csv(dir)
    dir
  }

  private lazy val cleanDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-clean").toString
    Preprocess.run(spark, rawDir, dir)
    dir
  }

  test("preprocess main: clean sink round-trips with normalized labels and clean text") {
    val cleaned = SentimentCsv.readClean(spark, cleanDir)
    assert(cleaned.columns.toSeq === Seq("label", "text"))
    val labels = cleaned.select($"label").distinct().as[Int].collect().toSet
    assert(labels.subsetOf(Set(0, 1)) && labels.nonEmpty)
    // clean chain applied: no mentions/URLs/hashes/digits survive
    val dirty = cleaned.filter($"text".rlike("[@#]|https?://|[0-9]")).count()
    assert(dirty === 0)
    assert(cleaned.filter(length($"text") === 0).count() === 0)
    assert(cleaned.count() > 300)
  }

  test("preprocess stats are in-engine aggregates over the cleaned frame") {
    val cleaned = SentimentCsv.readClean(spark, cleanDir)
    val dist = Preprocess.classDistribution(cleaned).collect()
    assert(dist.map(_.getLong(1)).sum === cleaned.count())
    val stats = Preprocess.lengthStats(cleaned).head()
    assert(stats.getLong(1) >= stats.getLong(2)) // max >= min
  }

  test("train main: lr fit → metrics JSON + loadable saved model") {
    val modelDir = java.nio.file.Files.createTempDirectory("graft-e2e-model").toString
    val metricsPath = java.nio.file.Files
      .createTempDirectory("graft-e2e-metrics").resolve("lr.json").toString
    val r = Train.run(spark, "lr", cleanDir, modelDir, metricsPath)
    // learnable by construction → well above chance
    assert(r.metrics.accuracy > 0.8, s"accuracy ${r.metrics.accuracy}")
    // metrics artifact has the reference shape and survives a JSON parse
    val parsed = ModelComparison.readMetrics(spark, metricsPath).head()
    assert(math.abs(parsed.getDouble(0) - r.metrics.accuracy) < 1e-9)
    // saved model reloads and reproduces predictions
    val reloaded = PipelineModel.load(modelDir)
    val test = SentimentCsv.readClean(spark, cleanDir)
      .withColumn("label", $"label".cast("double"))
    val a = r.model.transform(test).select($"prediction").as[Double].collect().toSeq
    val b = reloaded.transform(test).select($"prediction").as[Double].collect().toSeq
    assert(a === b)
    r.close() // trainEval persists; Result owns the cache lifetime
  }

  test("preprocess charts: label bars + before/after length comparison") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pp-charts").toString
    val cleaned = SentimentCsv.readClean(spark, cleanDir)
    Preprocess.writeCharts(spark, rawDir, cleaned, dir)
    Seq("label_distribution.svg", "length_before_after.svg").foreach { f =>
      val p = java.nio.file.Paths.get(dir, f)
      assert(java.nio.file.Files.exists(p), s"missing $f")
      scala.xml.XML.loadString(java.nio.file.Files.readString(p)) // well-formed
    }
    val lenSvg = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "length_before_after.svg"))
    // both distributions present (the 140-char marker is rightly absent
    // here — this fixture's max length sits below it; marker rendering
    // is covered in ModelChartsSpec)
    Seq("Before", "After").foreach(s =>
      assert(lenSvg.contains(s), s"missing '$s'"))
  }

  test("metrics JSON schema equals the reference artifact key-for-key") {
    // Pin the SHAPE, not just accuracy parse-back: infer both schemas
    // with the same reader and require exact equality (field names,
    // nesting, types). A renamed/dropped/retyped key in metricsJson now
    // fails here instead of silently diverging from
    // /root/reference/metrics/lr_metrics.json:1-16.
    val mine = SentimentPipeline.metricsJson(SentimentPipeline.Metrics(
      0.9, 0.8, 0.95, Map((0L, 0L) -> 10L, (0L, 1L) -> 2L,
        (1L, 0L) -> 3L, (1L, 1L) -> 11L)))
    val tmp = java.nio.file.Files.createTempDirectory("graft-metrics-schema")
      .resolve("mine.json")
    java.nio.file.Files.writeString(tmp, mine)
    def inferred(path: String) = spark.read
      .option("multiLine", "true").json(path).schema
    val refSchema = inferred("/root/reference/metrics/lr_metrics.json")
    assert(!refSchema.fieldNames.contains("_corrupt_record"))
    assert(inferred(tmp.toString) === refSchema)
  }

  test("train main: ngram branch (reference --use_ngram path) runs end-to-end") {
    val modelDir = java.nio.file.Files.createTempDirectory("graft-e2e-ng").toString
    val metricsPath = java.nio.file.Files
      .createTempDirectory("graft-e2e-ngm").resolve("lr_ngram.json").toString
    val r = Train.run(spark, "lr", cleanDir, modelDir, metricsPath,
      useNgram = true, ngramN = 2)
    assert(r.metrics.accuracy > 0.7, s"accuracy ${r.metrics.accuracy}")
    assert(ModelComparison.readMetrics(spark, metricsPath).head()
      .getDouble(0) === r.metrics.accuracy)
    r.close() // trainEval persists; Result owns the cache lifetime
  }

  test("score main: saved model scores a corpus; stream == batch predictions") {
    val modelDir = java.nio.file.Files
      .createTempDirectory("graft-score-model").toString
    val metricsPath = java.nio.file.Files
      .createTempDirectory("graft-score-m").resolve("lr.json").toString
    Train.run(spark, "lr", cleanDir, modelDir, metricsPath)
      .close() // trainEval persists; Result owns the cache lifetime
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-score-out").toString + "/scored"
    val n = graft.app.Score.run(spark, modelDir, cleanDir, outDir)
    assert(n === graft.operators.Filters.dropAnyNull(
      SentimentCsv.readClean(spark, cleanDir)).count())
    val scored = spark.read.parquet(outDir)
    assert(scored.columns.toSet === Set("label", "text", "prediction"))
    // the sink is partitioned by prediction -> pruned class reads
    val plan = scored.filter($"prediction" === 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(prediction"), plan)

    // the SAME loaded model scores a stream, predictions identical
    val model = PipelineModel.load(modelDir)
    val streamIn = java.nio.file.Files
      .createTempDirectory("graft-score-stream").toString
    val batchInput = graft.operators.Filters.dropAnyNull(
      SentimentCsv.readClean(spark, cleanDir))
    batchInput.write.mode("overwrite").parquet(streamIn)
    val stream = graft.app.Score.score(model,
      spark.readStream.schema(batchInput.schema).parquet(streamIn))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("score_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("score_out")
        .select($"text", $"prediction").collect().toSet
      val batch = graft.app.Score.score(model, batchInput)
        .select($"text", $"prediction").collect().toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("compare main: ranks models by accuracy and writes one artifact") {
    import graft.ml.SentimentPipeline
    val dir = java.nio.file.Files.createTempDirectory("graft-cmp")
    def write(name: String, acc: Double, auc: Double): (String, String) = {
      val m = SentimentPipeline.Metrics(acc, acc - 0.01, auc,
        Map((0L, 0L) -> 40L, (0L, 1L) -> 10L, (1L, 0L) -> 5L, (1L, 1L) -> 45L))
      val p = dir.resolve(s"$name.json").toString
      SentimentPipeline.writeMetrics(m, p)
      name -> p
    }
    val inputs = Seq(write("lr", 0.78, 0.85), write("nb", 0.76, 0.53),
      write("svm", 0.775, 0.848))
    val cmp = ModelComparison.compare(spark, inputs)
    assert(cmp.select($"model").as[String].collect().toSeq ===
      Seq("lr", "svm", "nb"))
    assert(ModelComparison.best(cmp) === "lr")
    assert(cmp.head().getLong(4) === 40L) // tn from confusion matrix
    val out = dir.resolve("comparison.json").toString
    ModelComparison.writeComparison(cmp, out)
    val arr = spark.read.schema(
        "model STRING, accuracy DOUBLE, f1 DOUBLE, roc_auc DOUBLE")
      .option("multiLine", "true").json(out)
    assert(arr.count() === 3)

    // chart artifact (compare_models.py's PNG analog): well-formed XML,
    // one legend entry per model, a value-labeled bar per finite metric
    val svg = dir.resolve("comparison.svg").toString
    ModelComparison.writeComparisonSvg(cmp, svg)
    val body = java.nio.file.Files.readString(java.nio.file.Paths.get(svg))
    assert(body.startsWith("<svg") && body.endsWith("</svg>"))
    scala.xml.XML.loadString(body) // throws if malformed
    Seq("lr", "nb", "svm").foreach(m => assert(body.contains(s">$m</text>")))
    assert(body.sliding(5).count(_ == "<path") === 9) // 3 models x 3 metrics
    assert(body.contains("0.780")) // relief rule: visible value labels

    // confusion grid (compare_models.py:43-58's 1×3 sns.heatmap grid):
    // one panel per model from the comparison frame's tn/fp/fn/tp
    val gridSvg = dir.resolve("comparison_confusion.svg").toString
    graft.ml.ModelCharts.writeConfusionGrid(
      cmp.collect().toSeq.map { r =>
        r.getString(0) -> Seq(
          (0L, 0L, r.getLong(4)), (0L, 1L, r.getLong(5)),
          (1L, 0L, r.getLong(6)), (1L, 1L, r.getLong(7)))
      }, gridSvg, "Confusion Matrix Comparison")
    val grid = java.nio.file.Files.readString(
      java.nio.file.Paths.get(gridSvg))
    scala.xml.XML.loadString(grid)
    Seq("lr", "nb", "svm").foreach(m => assert(grid.contains(s">$m</text>")))
    assert(grid.sliding(6).count(_ == "<rect ") >= 13) // surface + 3×4 cells
  }
}
