package graft.app

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ml.SentimentPipeline
import graft.operators.Filters
import graft.sources.SentimentCsv

/** End-to-end training entry point — the reference's three model mains
  * (`/root/reference/model_logistic_regression.py:71-301`,
  * `model_naive_bayes.py:44-214`, `model_svm.py:73-309`) unified behind a
  * model-kind argument (they share everything but the classifier stage):
  *
  *   cleaned CSV → dropna → 80/20 split (seed 42) → Pipeline.fit
  *   (tokenize → stopwords → TF-IDF [or NGram branch] → classifier) →
  *   transform(test) → in-engine evaluate (accuracy/F1/AUC + confusion) →
  *   metrics JSON sink + model save.
  *
  * Differences from the reference, by design: evaluation never collects
  * predictions (the reference's `toPandas` + sklearn confusion matrix at
  * `model_logistic_regression.py:217-218` becomes a groupBy aggregate),
  * and the metrics JSON shape matches `metrics/lr_metrics.json`.
  *
  * Usage: graft.app.Train <lr|nb|svm> <cleanDir> <modelOutDir> <metricsJsonPath>
  *        [--ngram N] (LR/SVM only, mirroring `model_logistic_regression.py:43-48`)
  */
object Train {

  final case class Result(model: PipelineModel,
      metrics: SentimentPipeline.Metrics)

  def classifier(kind: String): org.apache.spark.ml.PipelineStage =
    kind match {
      case "lr" => SentimentPipeline.logisticRegression()
      case "nb" => SentimentPipeline.naiveBayes()
      case "svm" => SentimentPipeline.linearSvc()
      case other => throw new IllegalArgumentException(
        s"unknown model kind '$other' (expected lr|nb|svm)")
    }

  /** Fit + evaluate on an already-loaded labeled frame (label, text). */
  def trainEval(labeled: DataFrame, kind: String,
      useNgram: Boolean = false, ngramN: Int = 2): Result = {
    val df = labeled.withColumn("label", col("label").cast("double"))
    val (train, test) = SentimentPipeline.split(df)
    val model = SentimentPipeline
      .pipeline(classifier(kind), useNgram, ngramN).fit(train)
    val predictions = model.transform(test)
    // LinearSVC emits no probability column; AUC always uses rawPrediction.
    Result(model, SentimentPipeline.evaluate(predictions))
  }

  /** Full reference workflow: read clean CSV → fit → eval → persist. */
  def run(spark: SparkSession, kind: String, cleanDir: String,
      modelDir: String, metricsPath: String,
      useNgram: Boolean = false, ngramN: Int = 2): Result = {
    val labeled = Filters.dropAnyNull(SentimentCsv.readClean(spark, cleanDir))
    val r = trainEval(labeled, kind, useNgram, ngramN)
    SentimentPipeline.writeMetrics(r.metrics, metricsPath)
    r.model.write.overwrite().save(modelDir)
    r
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: graft.Train <lr|nb|svc> <cleanDir> <modelDir> <metricsPath> " +
        "[--ngram N]")
    val Array(kind, cleanDir, modelDir, metricsPath) = args.take(4)
    val ngramN = args.sliding(2).collectFirst {
      case Array("--ngram", n) => n.toInt
    }
    val spark = Sessions.local(s"graft-train-$kind")
    val r = run(spark, kind, cleanDir, modelDir, metricsPath,
      useNgram = ngramN.isDefined, ngramN = ngramN.getOrElse(2))
    println(SentimentPipeline.metricsJson(r.metrics))
    spark.stop()
  }
}
