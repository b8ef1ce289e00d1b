package graft.app

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Filters
import graft.sources.SentimentCsv

/** Batch scoring entry point — the deployment half the reference stops
  * short of (its mains end at save; re-loading is only exercised
  * implicitly). A persisted [[PipelineModel]] carries the WHOLE
  * featurization chain, so scoring is: load model → read text → dropna →
  * transform → select (text, prediction) → partitioned parquet sink.
  *
  * Every stage of the loaded pipeline is row-local at transform time
  * (tokenize/stopwords/TF are projections; IDF and the classifier are
  * broadcast model state), so scoring is a single narrow stage: at
  * 100 TB it runs at scan speed with zero shuffles — the sink partition
  * count is the input's.
  *
  * The same loaded model scores a STREAM unchanged (ScoreSpec proves
  * batch==stream predictions): `readStream` → `model.transform` →
  * `writeStream`, because nothing in the pipeline aggregates.
  *
  * Usage: graft.app.Score <modelDir> <cleanCsvDir> <outParquetDir>
  */
object Score {

  /** Score a labeled-or-not text frame; returns (original cols +
    * prediction). Works on batch and streaming frames alike. */
  def score(model: PipelineModel, df: DataFrame): DataFrame =
    model.transform(df)
      .select(df.columns.map(col).toSeq :+
        col("prediction").cast("int").as("prediction"): _*)

  def run(spark: SparkSession, modelDir: String, cleanDir: String,
      outDir: String): Long = {
    val model = PipelineModel.load(modelDir)
    val input = Filters.dropAnyNull(SentimentCsv.readClean(spark, cleanDir))
    val scored = score(model, input)
    scored.write.mode("overwrite").partitionBy("prediction").parquet(outDir)
    spark.read.parquet(outDir).count()
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: graft.app.Score <modelDir> <cleanCsvDir> <outParquetDir>")
    val Array(modelDir, cleanDir, outDir) = args.take(3)
    val spark = Sessions.local("graft-score")
    val n = run(spark, modelDir, cleanDir, outDir)
    println(s"scored $n documents -> $outDir")
    spark.stop()
  }
}
