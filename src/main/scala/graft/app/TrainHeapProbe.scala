package graft.app

import graft.Telemetry

/** Focused A/B probe for the large-heap training pathology (VERDICT r9
  * item 1): the driver benches at a ~89 GB heap where `train_lr` ran
  * 164 s vs 13.7 s at 8 GB — same code, same data. This main isolates
  * the train stage so JVM-flag bisection is cheap:
  *
  *   - prepares the synthetic Sentiment140 clean corpus ONCE under
  *     `workDir` (reused across probe JVMs — corpus prep is not the
  *     suspect and would otherwise dominate each run), then
  *   - times `Train.trainEval(kind)` `reps` times in THIS JVM and
  *     prints one JSON line carrying heap size, the GC/JVM flags in
  *     effect, and per-run telemetry.
  *
  * Drive it with `tools/train_probe.sh` which runs the compiled classes
  * directly (no sbt per run) so -Xmx / GC flags vary per invocation.
  *
  * Usage: TrainHeapProbe <workDir> [lr|nb|svm] [reps] [rows]
  */
object TrainHeapProbe {

  /** Idempotent corpus prep: raw CSV + preprocessed clean CSV under
    * `workDir`, skipped when the clean sink is already complete. The row
    * count is part of the path, so changing PROBE_ROWS between runs
    * prepares a fresh corpus instead of silently reusing a stale one at
    * the old size (which would skew A/B comparisons). Returns
    * (rawDir, cleanDir); the raw side regenerates independently when
    * missing (a prep-kind probe needs raw even when clean survives). */
  def prepare(spark: org.apache.spark.sql.SparkSession, workDir: String,
      rows: Long): (String, String) = {
    val dir = java.nio.file.Paths.get(workDir, s"rows-$rows")
    java.nio.file.Files.createDirectories(dir)
    val raw = dir.resolve("raw")
    val clean = dir.resolve("clean")
    if (!java.nio.file.Files.exists(raw.resolve("_SUCCESS")))
      Sentiment140Smoke.generateRaw(spark, rows, raw.toString)
    if (!java.nio.file.Files.exists(clean.resolve("_SUCCESS")))
      Preprocess.run(spark, raw.toString, clean.toString)
    (raw.toString, clean.toString)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: TrainHeapProbe <workDir> [lr|nb|svm|prep] [reps] [rows]")
    val workDir = args(0)
    val kind = if (args.length > 1) args(1) else "lr"
    val reps = if (args.length > 2) args(2).toInt else 2
    val rows = if (args.length > 3) args(3).toLong else 1600000L
    val spark = Sessions.local(s"graft-train-probe-$kind")
    val (rawDir, cleanDir) = prepare(spark, workDir, rows)
    val runs = if (kind == "prep") {
      // the APP's preprocess stage verbatim (Sentiment140Smoke.run's
      // tPre region: clean chain + persist + charts) so the probe
      // number is comparable to the recorded sentiment140_preprocess —
      // VERDICT r15 #4: 82 s at the driver's 91 GiB vs 48 s at 8 GiB
      (1 to reps).map { i =>
        val out = java.nio.file.Paths.get(workDir, s"rows-$rows",
          s"prep-probe-$i")
        val (_, t) = Telemetry.timed(spark) {
          Preprocess.run(spark, rawDir, out.toString)
          val written = graft.sources.SentimentCsv
            .readClean(spark, out.toString).persist()
          try Preprocess.writeCharts(spark, rawDir, written,
            out.resolve("charts").toString)
          finally written.unpersist()
        }
        Sentiment140Smoke.deleteRecursively(out)
        t
      }
    } else {
      val labeled = graft.operators.Filters.dropAnyNull(
        graft.sources.SentimentCsv.readClean(spark, cleanDir))
      (1 to reps).map { _ =>
        val (r, t) = Telemetry.timed(spark)(Train.trainEval(labeled, kind))
        r.close()
        t
      }
    }
    import scala.jdk.CollectionConverters._
    // Hide only the boilerplate flags the launch script always sets —
    // user-supplied -D flags (e.g. spark.* tuning under probe) must log
    // verbatim or A/B configs look identical in the output.
    val scriptBoilerplate = Set(
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC")
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.filterNot(_.startsWith("--add-opens"))
      .filterNot(scriptBoilerplate)
    val gcNames = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getName)
    val probeName = if (kind == "prep") "preprocess" else "train"
    println(s"""{"probe":${Telemetry.jstr(probeName)},"kind":${Telemetry.jstr(kind)}""" +
      s""","heap_max_mb":${Runtime.getRuntime.maxMemory() / (1024 * 1024)}""" +
      s""","jvm_args":${jvmArgs.map(Telemetry.jstr).mkString("[", ",", "]")}""" +
      s""","gc":${Telemetry.jstr(gcNames.mkString(","))}""" +
      s""","runs":${runs.map(_.toJsonArray).mkString("[", ",", "]")}""" +
      s""","runs_shape":"[elapsed_sec,gc_delta_ms,load1,storage_free_mb]"}""")
    spark.stop()
  }
}
