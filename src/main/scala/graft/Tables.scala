package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-generated star schema + LLM-pipeline
  * fixtures (TESTDATA.md / FIXTURES.md §A).
  *
  * Design note (100 TB): all tables are loaded as plain parquet scans so
  * Catalyst can push filters/projections into the file source
  * (`PushedFilters` / `ReadSchema`). Never `.cache()` at load time — let the
  * caller decide; at cluster scale a blanket cache of a 100 TB fact table is
  * a failure mode, not an optimization.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet's `ts` physical type has varied across fixture
    * generations — parquet TIMESTAMP(NANOS) (rejected by Spark's default
    * reader), TIMESTAMP_MICROS with isAdjustedToUTC=0 (read as
    * TIMESTAMP_NTZ), or a plain UTC timestamp — so dispatch on the type
    * the footer actually declares and normalize every variant to a
    * uniform TimestampType (UTC-micros) column:
    *
    *   - nanos footer → set `spark.sql.legacy.parquet.nanosAsLong` (a
    *     session conf, not a per-read option: the flag must hold at
    *     execution time because executors re-read footers), read the
    *     nanos as LongType, and rebuild micros via `ts div 1000`
    *     (truncation toward zero — matches DuckDB's nanos→micros
    *     narrowing). The conf is only set on this path, so sessions
    *     reading micros fixtures never carry the silent side effect of
    *     OTHER nanos parquet in the session loading as LongType.
    *   - LongType → nanosAsLong already active in this session; same
    *     div-1000 rebuild.
    *   - TimestampNTZType → cast to TimestampType. The engine pins the
    *     session TZ to UTC, so NTZ micros ≡ UTC micros (pure relabel,
    *     no wall-clock shift).
    *   - TimestampType → passthrough.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventsTs(loadEventsRaw(s, s"$d/events.parquet"))

  /** Batch-load an events parquet, retrying under `nanosAsLong` when the
    * footer declares the nanos flavor the default reader rejects. */
  private[graft] def loadEventsRaw(s: SparkSession, path: String): DataFrame =
    try s.read.parquet(path)
    catch {
      // Nanos-era fixture: footer declares TIMESTAMP(NANOS), which the
      // default reader rejects at schema inference. Opt into legacy
      // long-reads and retry.
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.contains("PARQUET_TYPE_ILLEGAL") ||
             e.getMessage.contains("Illegal Parquet type") =>
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        s.read.parquet(path)
    }

  /** Normalize whatever flavor `ts` loaded as (see [[events]]) to a plain
    * UTC-micros TimestampType column. Shared with the streaming reader
    * ([[graft.streaming.EventStream.read]]) so batch and stream agree on
    * the convention by construction. */
  private[graft] def normalizeEventsTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other => sys.error(
        s"events.ts: unsupported parquet-loaded type $other — fixture " +
        "format drifted again; extend Tables.normalizeEventsTs dispatch")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every fixture table as a temp view named after itself, so
    * SQL-first users can `spark.sql("SELECT ... FROM lineitem ...")`
    * directly (pair with GraftExtensions for the custom functions).
    * `events` goes through [[events]] so the nanos timestamp convention
    * holds in SQL too.
    *
    * Registration is NOT free — each load() lists files and reads
    * parquet footers — so repeat calls for the SAME directory are
    * skipped. Registering a different directory re-registers (view
    * names are shared), which is why this tracks the last dir rather
    * than memoizing per dir: switching back must re-point the views. */
  private val lastRegistered =
    new java.util.WeakHashMap[SparkSession, String]()

  def registerViews(s: SparkSession, d: String): Unit =
    lastRegistered.synchronized {
      if (lastRegistered.get(s) != d) {
        all.foreach {
          case "events" => events(s, d).createOrReplaceTempView("events")
          case t => load(s, d, t).createOrReplaceTempView(t)
        }
        lastRegistered.put(s, d)
      }
    }
}
