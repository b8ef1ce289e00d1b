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
  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * rejects by default (PARQUET_TYPE_ILLEGAL). Read nanos as long and
    * rebuild a micros TimestampType column (truncation toward zero —
    * matches DuckDB's nanos→micros narrowing), so downstream operators see
    * a uniform TIMESTAMP schema.
    *
    * DELIBERATE session-wide side effect: `nanosAsLong` is a session
    * conf, not a per-read option, and the flag must hold at execution
    * time (executors re-read footers), so it cannot be set-and-restored
    * around the lazy read. Consequence for callers: after the first
    * `events` read, OTHER nanos-timestamp parquet in the same session
    * also reads as LongType (silently) instead of failing loudly —
    * apply the same div-1000 rebuild there, or use a separate session.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
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
