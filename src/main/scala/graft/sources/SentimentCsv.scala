package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** The reference's CSV ingest/egress surface (SURVEY.md §2.1 S1/S2/S4).
  *
  * - Raw Sentiment140 ingest uses the exact fixed DDL from
  *   `/root/reference/preprocessing.py:21-35` (no header, explicit
  *   schema — never inferSchema in library code).
  * - The cleaned-data re-read mirrors `model_logistic_regression.py:71-75`
  *   (header + schema inference behind an explicit opt-in).
  * - The sink mirrors `preprocessing.py:166-169`: coalesce(4) narrows
  *   partitions WITHOUT a shuffle purely to bound output file count —
  *   at 100 TB replace the constant with a target-file-size calculation,
  *   never coalesce(1).
  */
object SentimentCsv {

  /** sentiment INT, id STRING, date STRING, query STRING, user STRING,
    * text STRING (`preprocessing.py:21-28`). */
  val rawSchema: StructType = StructType(Seq(
    StructField("sentiment", IntegerType),
    StructField("id", StringType),
    StructField("date", StringType),
    StructField("query", StringType),
    StructField("user", StringType),
    StructField("text", StringType)))

  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(rawSchema).option("header", "false").csv(path)

  /** Cleaned data: label INT, text STRING; header present. */
  val cleanSchema: StructType = StructType(Seq(
    StructField("label", IntegerType),
    StructField("text", StringType)))

  def readClean(spark: SparkSession, path: String,
      infer: Boolean = false): DataFrame = {
    val r = spark.read.option("header", "true")
    if (infer) r.option("inferSchema", "true").csv(path)
    else r.schema(cleanSchema).csv(path)
  }

  def writeClean(df: DataFrame, path: String, numFiles: Int = 4): Unit =
    df.coalesce(numFiles).write.mode("overwrite")
      .option("header", "true").csv(path)
}
