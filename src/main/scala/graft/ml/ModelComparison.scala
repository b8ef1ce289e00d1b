package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model comparison report — the reference's `compare_models.py:13-58`
  * re-expressed as a DataFrame job: load each per-model metrics JSON
  * (the shape [[SentimentPipeline.metricsJson]] writes), stack them into
  * one comparison frame, rank by the chosen metric, and emit a single
  * comparison JSON artifact.
  *
  * The inputs are driver-sized (one small JSON per model), so the only
  * "scale" concern is honesty about that: files are read through
  * spark.read.json for schema discipline, and the comparison itself is a
  * few-row DataFrame the driver may safely collect.
  */
object ModelComparison {

  /** Fixed metrics schema (never inferSchema in library code). */
  val metricsSchema: StructType = StructType(Seq(
    StructField("accuracy", DoubleType),
    StructField("f1", DoubleType),
    StructField("roc_auc", DoubleType),
    StructField("confusion_matrix", ArrayType(ArrayType(LongType)))))

  /** Load one metrics JSON (multiLine: metricsJson spans lines). */
  def readMetrics(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(metricsSchema).option("multiLine", "true").json(path)

  /** Stack named metrics files into one frame:
    * (model, accuracy, f1, roc_auc, tn, fp, fn, tp), best first.
    * Mirrors compare_models.py's bar-chart input table. */
  def compare(spark: SparkSession, metricsByModel: Seq[(String, String)])
      : DataFrame = {
    val frames = metricsByModel.map { case (name, path) =>
      readMetrics(spark, path).select(
        lit(name).as("model"),
        round(col("accuracy"), 6).as("accuracy"),
        round(col("f1"), 6).as("f1"),
        round(col("roc_auc"), 6).as("roc_auc"),
        col("confusion_matrix")(0)(0).as("tn"),
        col("confusion_matrix")(0)(1).as("fp"),
        col("confusion_matrix")(1)(0).as("fn"),
        col("confusion_matrix")(1)(1).as("tp"))
    }
    frames.reduce(_.unionByName(_))
      .orderBy(col("accuracy").desc, col("model"))
  }

  /** Best model by accuracy (compare_models.py's implicit headline). */
  def best(comparison: DataFrame): String =
    comparison.select(col("model")).head().getString(0)

  /** Write the comparison as one JSON array artifact (driver-side write:
    * the frame is #models rows by construction). NaN/null metrics (e.g.
    * a degenerate split making AUC undefined) serialize as JSON null —
    * bare NaN is invalid JSON; model names are string-escaped. */
  def writeComparison(comparison: DataFrame, path: String): Unit = {
    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    def num(r: org.apache.spark.sql.Row, i: Int): String =
      if (r.isNullAt(i) || r.getDouble(i).isNaN) "null"
      else r.getDouble(i).toString
    def cnt(r: org.apache.spark.sql.Row, i: Int): String =
      if (r.isNullAt(i)) "null" else r.getLong(i).toString
    val rows = comparison.collect().map { r =>
      s"""{"model": "${esc(r.getString(0))}", "accuracy": ${num(r, 1)},
         | "f1": ${num(r, 2)}, "roc_auc": ${num(r, 3)},
         | "confusion_matrix": [[${cnt(r, 4)}, ${cnt(r, 5)}], [${cnt(r, 6)}, ${cnt(r, 7)}]]}"""
        .stripMargin
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      rows.mkString("[", ",\n", "]"))
  }
}
