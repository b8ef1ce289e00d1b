package graft

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ml.{BinaryMetrics, SentimentPipeline}

/** Golden-tolerance tests on a committed-by-construction synthetic corpus
  * (FIXTURES.md B4: seeded, balanced), mirroring the reference's
  * artifact-based verification (metrics JSONs + persisted models). */
class MLPipelineSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic mini corpus: positive docs draw from a "positive"
    * vocabulary, negative from a "negative" one, with shared noise. */
  private lazy val corpus: DataFrame = {
    val pos = Vector("good", "great", "excellent", "love", "wonderful", "best")
    val neg = Vector("bad", "awful", "terrible", "hate", "worst", "poor")
    val noise = Vector("the", "movie", "film", "plot", "actor", "scene", "was", "very")
    val rnd = new scala.util.Random(42)
    val rows = (0 until 400).map { i =>
      val label = i % 2
      val vocab = if (label == 1) pos else neg
      val words = (0 until 12).map { _ =>
        if (rnd.nextDouble() < 0.5) vocab(rnd.nextInt(vocab.size))
        else noise(rnd.nextInt(noise.size))
      }
      (words.mkString(" "), label.toDouble)
    }
    rows.toDF("text", "label")
  }

  private def trainEval(clf: org.apache.spark.ml.PipelineStage)
      : SentimentPipeline.Metrics = {
    val (tr, te) = SentimentPipeline.split(corpus)
    val model = SentimentPipeline.pipeline(clf).fit(tr)
    SentimentPipeline.evaluate(model.transform(te))
  }

  test("LR pipeline learns the synthetic sentiment corpus") {
    val m = trainEval(SentimentPipeline.logisticRegression())
    assert(m.accuracy > 0.9, s"accuracy ${m.accuracy}")
    assert(m.rocAuc > 0.95, s"auc ${m.rocAuc}")
    assert(m.confusion.values.sum > 0)
  }

  test("NB pipeline learns the synthetic sentiment corpus") {
    val m = trainEval(SentimentPipeline.naiveBayes())
    assert(m.accuracy > 0.85, s"accuracy ${m.accuracy}")
  }

  test("LinearSVC pipeline learns the synthetic sentiment corpus") {
    val m = trainEval(SentimentPipeline.linearSvc())
    assert(m.accuracy > 0.9, s"accuracy ${m.accuracy}")
  }

  test("ngram branch pipeline trains and predicts") {
    val (tr, te) = SentimentPipeline.split(corpus)
    val model = SentimentPipeline
      .pipeline(SentimentPipeline.logisticRegression(), useNgram = true).fit(tr)
    val m = SentimentPipeline.evaluate(model.transform(te))
    assert(m.accuracy > 0.85, s"accuracy ${m.accuracy}")
  }

  test("model save/load round-trip yields identical predictions") {
    val (tr, te) = SentimentPipeline.split(corpus)
    val model = SentimentPipeline
      .pipeline(SentimentPipeline.logisticRegression()).fit(tr)
    val dir = java.nio.file.Files.createTempDirectory("graft-model").toString
    model.write.overwrite().save(dir)
    val reloaded = PipelineModel.load(dir)
    val a = model.transform(te).select($"prediction").as[Double].collect().toSeq
    val b = reloaded.transform(te).select($"prediction").as[Double].collect().toSeq
    assert(a === b)
  }

  test("binned in-engine AUC matches BinaryClassificationEvaluator within 0.02") {
    val (tr, te) = SentimentPipeline.split(corpus)
    val model = SentimentPipeline
      .pipeline(SentimentPipeline.logisticRegression()).fit(tr)
    val scored = model.transform(te)
      .select(element_at(vector_to_array($"probability"), 2).as("score"),
        $"label", $"rawPrediction")
    val exact = new BinaryClassificationEvaluator().setLabelCol("label")
      .setRawPredictionCol("rawPrediction").evaluate(scored)
    val binned = BinaryMetrics.binnedAuc(scored, "score", "label")
    assert(math.abs(exact - binned) < 0.02, s"exact=$exact binned=$binned")
    // the exact in-engine form needs no binning tolerance: with fewer
    // distinct scores than the evaluator's 1000 bins both are exact,
    // so they must agree to float noise, not 0.02
    val engineExact = BinaryMetrics.exactAuc(scored, "score", "label")
    assert(math.abs(exact - engineExact) < 1e-6,
      s"evaluator=$exact engine=$engineExact")
  }

  test("single-class input yields NaN AUC, not a crash") {
    val oneClass = Seq((0.9, 1), (0.3, 1)).toDF("score", "label")
    assert(BinaryMetrics.exactAuc(oneClass, "score", "label").isNaN)
    assert(BinaryMetrics.binnedAuc(oneClass, "score", "label").isNaN)
  }

  test("exact ROC matches the hand-computed curve point for point") {
    // scores 0.9,0.8,0.8,0.4,0.3 / labels 1,1,0,1,0 → P=3, N=2
    // thresholds desc: 0.9 (tp1,fp0), 0.8 (tp2,fp1), 0.4 (tp3,fp1), 0.3 (tp3,fp2)
    val df = Seq((0.9, 1), (0.8, 1), (0.8, 0), (0.4, 1), (0.3, 0))
      .toDF("score", "label")
    val got = BinaryMetrics.exactRoc(df, "score", "label")
      .as[(Double, Double, Double)].collect().toSeq
    val want = Seq(
      (0.9, 0.0, 1.0 / 3), (0.8, 0.5, 2.0 / 3),
      (0.4, 0.5, 1.0), (0.3, 1.0, 1.0))
    assert(got === want)
  }

  test("metrics JSON has the reference shape") {
    val m = SentimentPipeline.Metrics(0.9, 0.89, 0.95,
      Map((0L, 0L) -> 40L, (0L, 1L) -> 10L, (1L, 0L) -> 5L, (1L, 1L) -> 45L))
    val js = SentimentPipeline.metricsJson(m)
    assert(js.contains("\"accuracy\"") && js.contains("\"roc_auc\""))
    assert(js.contains("[[40, 10], [5, 45]]"))
  }
}
