package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSON-lines ingestion/egress — the interchange format most raw text
  * corpora arrive in. Library discipline as everywhere in graft: schemas
  * are EXPLICIT (`inferSchema` would add a full extra pass over 100 TB
  * and lets a single odd file silently widen a column), and malformed
  * input is handled deliberately, not dropped on the floor.
  *
  * Two read modes:
  *  - [[read]]: FAILFAST — a malformed line kills the job. Right for
  *    curated inputs where corruption means an upstream bug.
  *  - [[readQuarantine]]: PERMISSIVE split — well-formed rows parse,
  *    malformed lines land in a quarantine frame with their raw text
  *    for offline inspection. Right for internet-scraped corpora where
  *    some breakage is normal and dropping it silently would skew the
  *    corpus unobserved.
  */
object JsonLines {

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Strict read: explicit schema, fail on the first malformed line. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Result of [[readQuarantine]]. `unpersist()` releases the shared
    * cached scan both frames are carved from — unpersisting `parsed` or
    * `quarantined` themselves would be a no-op (their plans are
    * projections over the cached scan, not the scan itself), which is
    * why the handle owns the lifecycle. */
  final case class Quarantined(parsed: DataFrame, quarantined: DataFrame,
      private val raw: DataFrame) {
    def unpersist(): Unit = { raw.unpersist(); () }
  }

  /** Permissive read split into parsed rows + quarantined raw lines.
    * The corrupt-record column only materializes on parse failure;
    * Spark disallows filtering a JSON scan by the corrupt column alone,
    * so the scan is cached once and both frames are carved from it —
    * one read of the input, not two. Call `unpersist()` on the result
    * when both frames are consumed. */
  def readQuarantine(spark: SparkSession, path: String,
      schema: StructType): Quarantined = {
    val corrupt = "_corrupt_record"
    require(!schema.fieldNames.contains(corrupt),
      s"schema must not declare $corrupt; it is added internally")
    val raw = spark.read
      .schema(schema.add(corrupt, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .json(path)
      .cache()
    val good = raw.filter(col(corrupt).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val bad = raw.filter(col(corrupt).isNotNull)
      .select(col(corrupt).as("raw_line"))
    Quarantined(good, bad, raw)
  }
}
