package graft

import org.apache.spark.sql.functions._
import graft.app.Curate
import graft.sources.PartitionedParquet

/** The full curation pipeline composed end-to-end on the sf0.001 fixture:
  * funnel monotonicity, sink round-trips, and packing coverage. */
class CurateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val outDir =
    java.nio.file.Files.createTempDirectory("graft-curate").toString
  private lazy val result = Curate.run(spark, sf001, outDir)

  test("funnel is monotonically non-increasing and ends non-empty") {
    val counts = result.funnel.map(_._2)
    assert(result.funnel.map(_._1) ===
      Seq("input", "quality_gate", "exact_dedup", "near_dedup", "mixed"))
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"funnel not monotone: ${result.funnel}")
    assert(counts.last > 0)
  }

  test("curated sink round-trips partitioned by lang") {
    val back = PartitionedParquet.read(spark, s"$outDir/curated")
    assert(back.count() === result.curated.count())
    // partition pruning works on the sink
    val plan = back.filter($"lang" === "en")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
  }

  test("packing covers every curated document exactly once") {
    val packed = spark.read.parquet(s"$outDir/packed")
    assert(packed.count() === result.curated.count())
    assert(packed.select($"doc_id").distinct().count() === result.curated.count())
  }

  test("curated text is PII-redacted by default") {
    // the pipeline scrubs before any content-derived signal; a curated
    // corpus must contain no email/URL-shaped strings
    val leaky = result.curated.filter(
      $"text".rlike(graft.operators.TextClean.PiiEmailPattern) ||
        $"text".rlike(graft.operators.TextClean.PiiUrlPattern)).count()
    assert(leaky === 0)
  }

  test("benchmark decontamination drops every contaminated doc") {
    import graft.operators.{TextClean, TokenOps}
    val benchDir =
      java.nio.file.Files.createTempDirectory("graft-bench").toString
    Tables.documents(spark, sf001).filter($"doc_id" % 25 === 0)
      .write.mode("overwrite").parquet(s"$benchDir/documents.parquet")
    val out2 =
      java.nio.file.Files.createTempDirectory("graft-curate-dc").toString
    val r = Curate.run(spark, sf001, out2,
      Curate.Config(benchmarkDir = Some(benchDir)))
    assert(r.funnel.map(_._1).contains("decontaminated"))
    val benchFp = Tables.documents(spark, benchDir)
      .select(TokenOps.bagOfWordsFingerprint(
        TextClean.redact($"text")).as("fp"))
    val leak = r.curated
      .select(TokenOps.bagOfWordsFingerprint($"text").as("fp"))
      .join(benchFp, "fp").count()
    assert(leak === 0, "contaminated documents survived curation")
    assert(r.curated.count() > 0)
  }

  test("curated rows satisfy the gate and are fingerprint-unique") {
    val curated = result.curated
    assert(curated.filter($"quality" < 0.55 || $"n_tokens" < 5).count() === 0)
    val fpDups = curated
      .groupBy(graft.operators.TokenOps.bagOfWordsFingerprint($"text"))
      .count().filter($"count" > 1).count()
    assert(fpDups === 0, "exact duplicates survived curation")
  }

  test("ingest --stream drains each landed file exactly once, matching the batch gate") {
    // stage/run/stage/run/no-op: the checkpointed end-to-end main wiring
    // Curate.gate over Incremental.runParquet (graft.app.Ingest).
    val in = java.nio.file.Files.createTempDirectory("graft-ingest-in")
    val ck = java.nio.file.Files.createTempDirectory("graft-ingest-ck").toString
    val out = java.nio.file.Files.createTempDirectory("graft-ingest-out")
      .toString + "/gated"
    def stage(name: String): Unit =
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf001/documents.parquet"), in.resolve(name))
    val schema = Tables.documents(spark, sf001).schema
    def runOnce(): Unit =
      graft.app.Ingest.runOnce(spark, in.toString, schema, ck, out)

    val batch = Curate.gate(Tables.documents(spark, sf001))
      .select($"doc_id", $"text", $"lang", $"source", $"n_tokens", $"quality")
    val perFile = batch.count()
    assert(perFile > 0)

    stage("a.parquet"); runOnce()
    // gated output == batch gate output, column for column
    assert(spark.read.parquet(out).collect().toSet === batch.collect().toSet)
    // second run with a new file: ONLY the new file's rows are appended
    stage("b.parquet"); runOnce()
    assert(spark.read.parquet(out).count() === 2 * perFile)
    // no new files: a re-run emits nothing
    runOnce()
    assert(spark.read.parquet(out).count() === 2 * perFile)
  }

  test("row-local gate streams: streaming output == batch output") {
    // the gate is projection+filter only, so the SAME function runs on a
    // file stream — ingest-time curation
    val dir = java.nio.file.Files.createTempDirectory("graft-gate-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf001/documents.parquet"),
      dir.resolve("documents.parquet"))
    val batchIn = Tables.documents(spark, sf001)
    val streamIn = spark.readStream.schema(batchIn.schema)
      .parquet(dir.toString)
    val q = Curate.gate(streamIn).writeStream.outputMode("append")
      .format("memory").queryName("gate_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("gate_out")
        .select($"doc_id", $"text", $"quality").collect().toSet
      val batch = Curate.gate(batchIn)
        .select($"doc_id", $"text", $"quality").collect().toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("optional per-source cap bounds every source and shows in the funnel") {
    val out =
      java.nio.file.Files.createTempDirectory("graft-curate-cap").toString
    val r = Curate.run(spark, sf001, out,
      Curate.Config(maxPerSource = Some(3)))
    assert(r.funnel.map(_._1).contains("source_cap"))
    val perSource = r.curated.groupBy($"source").count()
      .as[(String, Long)].collect()
    assert(perSource.nonEmpty && perSource.forall(_._2 <= 3), perSource.toSeq)
    // funnel stays monotone through the new stage
    val counts = r.funnel.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a }, r.funnel)
  }
}
