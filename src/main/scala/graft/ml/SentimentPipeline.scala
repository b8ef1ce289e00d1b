package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel, PipelineStage}
import org.apache.spark.ml.classification.{LinearSVC, LogisticRegression, NaiveBayes}
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, MulticlassClassificationEvaluator}
import org.apache.spark.ml.feature._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's model-training surface, re-expressed in Scala MLlib
  * with the exact persisted hyperparameters (SURVEY.md §2.5, confirmed by
  * the stage metadata under /root/reference/model/&#123;logistic_regression,
  * naive_bayes, svm_linear&#125;/stages/):
  *
  *  - Tokenizer(text→words), StopWordsRemover(words→filtered_words)
  *  - TF-IDF branch: HashingTF(2^18, filtered_words→raw_features) →
  *    IDF(minDocFreq=5, →features)  [`model_logistic_regression.py:103-116`]
  *  - N-Gram branch (`--use_ngram`): per n in 1..N: NGram(n) →
  *    CountVectorizer(vocabSize=10000, minDF=5) → VectorAssembler
  *    [`model_logistic_regression.py:124-150`]
  *  - LogisticRegression(maxIter=20, regParam=0.01, elasticNetParam=0.0)
  *    [`model_logistic_regression.py:155-161`]
  *  - NaiveBayes(multinomial, smoothing=1.0)  [`model_naive_bayes.py:83-88`]
  *  - LinearSVC(maxIter=20, regParam=0.01)  [`model_svm.py:157-162`]
  *
  * Scale notes: all transformers are row-local; the fits are
  * treeAggregate jobs (IDF/NB one pass, LR/SVC one pass per L-BFGS/OWLQN
  * iteration over cached instances). Evaluation is in-engine — the
  * reference's collect-to-sklearn confusion matrix
  * (`model_logistic_regression.py:217-218`) is replaced by a
  * groupBy(label, prediction) aggregate, and ROC/AUC by the binned
  * in-engine form in [[BinaryMetrics]].
  */
object SentimentPipeline {

  val NumFeatures: Int = 1 << 18

  /** Feature stages shared by all three models (TF-IDF branch). */
  def tfidfStages(): Array[PipelineStage] = Array(
    new Tokenizer().setInputCol("text").setOutputCol("words"),
    new StopWordsRemover().setInputCol("words").setOutputCol("filtered_words"),
    new HashingTF().setInputCol("filtered_words").setOutputCol("raw_features")
      .setNumFeatures(NumFeatures),
    new IDF().setInputCol("raw_features").setOutputCol("features")
      .setMinDocFreq(5))

  /** N-Gram branch: unigram..N-gram counts assembled into one vector. */
  def ngramStages(maxN: Int): Array[PipelineStage] = {
    val base: Array[PipelineStage] = Array(
      new Tokenizer().setInputCol("text").setOutputCol("words"),
      new StopWordsRemover().setInputCol("words").setOutputCol("filtered_words"))
    val perN = (1 to maxN).flatMap { n =>
      Seq(
        new NGram().setN(n).setInputCol("filtered_words")
          .setOutputCol(s"${n}_grams"),
        new CountVectorizer().setInputCol(s"${n}_grams")
          .setOutputCol(s"${n}_tf").setVocabSize(10000).setMinDF(5.0))
    }
    val assembler = new VectorAssembler()
      .setInputCols((1 to maxN).map(n => s"${n}_tf").toArray)
      .setOutputCol("features")
    base ++ perN :+ assembler
  }

  def logisticRegression(): LogisticRegression =
    new LogisticRegression().setLabelCol("label").setFeaturesCol("features")
      .setMaxIter(20).setRegParam(0.01).setElasticNetParam(0.0)

  def naiveBayes(): NaiveBayes =
    new NaiveBayes().setLabelCol("label").setFeaturesCol("features")
      .setModelType("multinomial").setSmoothing(1.0)

  def linearSvc(): LinearSVC =
    new LinearSVC().setLabelCol("label").setFeaturesCol("features")
      .setMaxIter(20).setRegParam(0.01)

  def pipeline(classifier: PipelineStage, useNgram: Boolean = false,
      ngramN: Int = 2): Pipeline = {
    val feats = if (useNgram) ngramStages(ngramN) else tfidfStages()
    new Pipeline().setStages(feats :+ classifier)
  }

  /** 80/20 split with the reference's seed (`model_*.py`: seed=42). */
  def split(df: DataFrame): (DataFrame, DataFrame) = {
    val Array(tr, te) = df.randomSplit(Array(0.8, 0.2), seed = 42)
    (tr, te)
  }

  final case class Metrics(accuracy: Double, f1: Double, rocAuc: Double,
      confusion: Map[(Long, Long), Long])

  /** In-engine evaluation: evaluators for accuracy/F1/AUC + a
    * groupBy(label, prediction) confusion matrix (never collect the
    * predictions themselves). */
  def evaluate(predictions: DataFrame,
      rawCol: String = "rawPrediction"): Metrics = {
    val acc = new MulticlassClassificationEvaluator().setLabelCol("label")
      .setPredictionCol("prediction").setMetricName("accuracy")
      .evaluate(predictions)
    val f1 = new MulticlassClassificationEvaluator().setLabelCol("label")
      .setPredictionCol("prediction").setMetricName("f1")
      .evaluate(predictions)
    val auc = new BinaryClassificationEvaluator().setLabelCol("label")
      .setRawPredictionCol(rawCol).setMetricName("areaUnderROC")
      .evaluate(predictions)
    val confusion = confusionMatrix(predictions).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    Metrics(acc, f1, auc, confusion)
  }

  /** The confusion matrix as a (label, prediction, n) aggregate. */
  def confusionMatrix(predictions: DataFrame): DataFrame =
    predictions
      .groupBy(col("label").cast("long").as("label"),
        col("prediction").cast("long").as("prediction"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label"), col("prediction"))

  /** Metrics JSON sink matching the reference's shape
    * (`model_logistic_regression.py:221-229` → metrics/lr_metrics.json):
    * accuracy, f1, roc_auc, confusion_matrix [[tn, fp], [fn, tp]]. */
  def metricsJson(m: Metrics): String = {
    def c(l: Long, p: Long) = m.confusion.getOrElse((l, p), 0L)
    s"""{"accuracy": ${m.accuracy}, "f1": ${m.f1}, "roc_auc": ${m.rocAuc},
       | "confusion_matrix": [[${c(0, 0)}, ${c(0, 1)}], [${c(1, 0)}, ${c(1, 1)}]]}"""
      .stripMargin
  }

  def writeMetrics(m: Metrics, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), metricsJson(m))
}
