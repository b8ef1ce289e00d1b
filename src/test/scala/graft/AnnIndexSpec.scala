package graft

import org.apache.spark.sql.functions._
import graft.ml.AnnIndex
import graft.operators.Similarity
import graft.sources.PartitionedParquet

/** Materialized ANN index: probe results must equal the scan-form
  * operators, and probes must prune partitions (never scan the index). */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf001)
  private lazy val query: Seq[Double] =
    emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)

  private lazy val hyperPath = {
    val p = java.nio.file.Files.createTempDirectory("graft-hyper").toString + "/idx"
    AnnIndex.buildHyperplane(emb, "vec_id", "embedding", p)
    p
  }

  private lazy val ivfBuilt = {
    val p = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/idx"
    val centroids = AnnIndex.buildIvf(emb, "vec_id", "embedding", p, nlist = 4)
    (p, centroids)
  }

  test("hyperplane probe == scan-form annTopK") {
    val probe = AnnIndex.probeHyperplane(spark, hyperPath, query, k = 10,
        excludeId = Some(0L))
      .as[(Long, Double)].collect().toSeq
    val scan = Similarity.annTopK(emb.filter($"vec_id" =!= 0),
        "vec_id", "embedding", query, k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(probe === scan)
    assert(probe.nonEmpty)
  }

  test("hyperplane probe prunes to the query's buckets (PartitionFilters)") {
    val probe = AnnIndex.probeHyperplane(spark, hyperPath, query, k = 10)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), s"no partition filters:\n$plan")
    assert(plan.contains("table_id"), s"bucket predicate not pushed:\n$plan")
    // and the filter is selective: candidates << index rows
    val indexRows = PartitionedParquet.read(spark, hyperPath).count()
    val candRows = AnnIndex.probeHyperplane(spark, hyperPath, query,
      k = Int.MaxValue).count()
    assert(candRows < indexRows / 4,
      s"probe read $candRows of $indexRows index rows")
  }

  test("batched probe == per-query probes for every query") {
    val index = PartitionedParquet.read(spark, hyperPath)
    val queries = emb.filter($"vec_id" < 5)
    val batch = AnnIndex.probeHyperplaneBatch(index, queries,
        "vec_id", "embedding", k = 5, excludeSelf = true)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toSeq)
      .toMap
    assert(batch.keySet === Set(0L, 1L, 2L, 3L, 4L))
    for (qid <- batch.keySet) {
      val qv = emb.filter($"vec_id" === qid)
        .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
      val single = AnnIndex.probeHyperplane(index, qv, k = 5,
          tables = 16, bitsPerTable = 8, excludeId = Some(qid))
        .as[(Long, Double)].collect().toSeq
      assert(batch(qid) === single, s"mismatch for query $qid")
    }
  }

  test("id-only index layout probes to the same results as vector-inline") {
    val p = java.nio.file.Files.createTempDirectory("graft-hyper-ids")
      .toString + "/idx"
    AnnIndex.buildHyperplane(emb, "vec_id", "embedding", p,
      storeVectors = false)
    val idx = PartitionedParquet.read(spark, p)
    assert(!idx.columns.contains("v"), "id-only layout must not store vectors")
    val probe = AnnIndex.probeHyperplaneIds(idx, emb, "vec_id", "embedding",
        query, k = 10, excludeId = Some(0L))
      .as[(Long, Double)].collect().toSeq
    val inline = AnnIndex.probeHyperplane(spark, hyperPath, query, k = 10,
        excludeId = Some(0L))
      .as[(Long, Double)].collect().toSeq
    assert(probe === inline)
    assert(probe.nonEmpty)
    // the vector fetch pushes the candidate-id IN filter to the base scan
    val fetchPlan = AnnIndex.probeHyperplaneIds(idx, emb, "vec_id",
      "embedding", query, k = 10).queryExecution.executedPlan.toString
    assert(fetchPlan.contains("PushedFilters: [In(vec_id"),
      s"candidate fetch not pushed:\n$fetchPlan")
  }

  test("quantized index: 8x smaller rows, high recall vs exact probe") {
    val p = java.nio.file.Files.createTempDirectory("graft-hyper-q")
      .toString + "/idx"
    AnnIndex.buildHyperplaneQuantized(emb, "vec_id", "embedding", p)
    val idx = PartitionedParquet.read(spark, p)
    assert(idx.columns.toSet === Set("id", "qc", "qs", "table_id", "bucket"))
    val exact = AnnIndex.probeHyperplane(spark, hyperPath, query, k = 10,
        excludeId = Some(0L))
      .as[(Long, Double)].collect().map(_._1).toSet
    val quant = AnnIndex.probeHyperplaneQuantized(idx, query, k = 10,
        excludeId = Some(0L))
      .as[(Long, Double)].collect().map(_._1).toSet
    // identical candidate sets (bucketing is on exact vectors); the
    // re-rank may swap near-ties, so assert strong overlap not equality
    assert(exact.intersect(quant).size >= 8,
      s"recall too low: exact=$exact quant=$quant")
  }

  test("wrong-dimension query is rejected, not silently mis-bucketed") {
    val index = PartitionedParquet.read(spark, hyperPath)
    val err = intercept[IllegalArgumentException] {
      AnnIndex.probeHyperplane(index, query ++ Seq(0.0), k = 5,
        tables = 16, bitsPerTable = 8, excludeId = None)
    }
    assert(err.getMessage.contains("dimension"))
  }

  test("quantized probe rejects a wrong-dimension query too") {
    val p = java.nio.file.Files.createTempDirectory("graft-hyper-qdim")
      .toString + "/idx"
    AnnIndex.buildHyperplaneQuantized(emb, "vec_id", "embedding", p)
    val idx = PartitionedParquet.read(spark, p)
    val err = intercept[IllegalArgumentException] {
      AnnIndex.probeHyperplaneQuantized(idx, query ++ Seq(0.0), k = 5)
    }
    assert(err.getMessage.contains("dimension"))
  }

  test("id-only probe caps the candidate collect: fallback == IN-list path") {
    val p = java.nio.file.Files.createTempDirectory("graft-hyper-hot")
      .toString + "/idx"
    AnnIndex.buildHyperplane(emb, "vec_id", "embedding", p,
      storeVectors = false)
    val idx = PartitionedParquet.read(spark, p)
    // Force the over-threshold path with a tiny cap: every bucket is
    // "hot" relative to it, so the fetch must take the semi-join route
    // and still return exactly what the IN-list route returns.
    val capped = AnnIndex.probeHyperplaneIds(idx, emb, "vec_id", "embedding",
        query, k = 10, excludeId = Some(0L), maxInListCandidates = 1)
      .as[(Long, Double)].collect().toSeq
    val inList = AnnIndex.probeHyperplaneIds(idx, emb, "vec_id", "embedding",
        query, k = 10, excludeId = Some(0L))
      .as[(Long, Double)].collect().toSeq
    assert(capped === inList)
    assert(capped.nonEmpty)
    // and the fallback plan is a semi-join, not an IN predicate
    val plan = AnnIndex.probeHyperplaneIds(idx, emb, "vec_id", "embedding",
        query, k = 10, maxInListCandidates = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"no semi-join fallback:\n$plan")
  }

  test("IVF full probe == brute force; centroids round-trip") {
    val (path, centroids) = ivfBuilt
    val full = AnnIndex.probeIvf(spark, path, centroids, query, k = 10,
        nprobe = 4, excludeId = Some(0L))
      .as[(Long, Double)].collect().toSeq
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queryId = 0L, k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(full === brute)
    val reloaded = AnnIndex.readCentroids(spark, path)
    assert(reloaded.map(_.toSeq).toSeq === centroids.map(_.toSeq).toSeq)
  }

  test("IVF partial probe prunes cells and matches IvfIndex.topK semantics") {
    val (path, centroids) = ivfBuilt
    val probe = AnnIndex.probeIvf(spark, path, centroids, query, k = 5,
      nprobe = 2, excludeId = Some(0L))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), s"no partition filters:\n$plan")
    // the pruned probe reads only the probed cells
    val cellRows = PartitionedParquet.read(spark, path)
      .groupBy($"cell").count().as[(Int, Long)].collect().toMap
    val probeCells = centroids.zipWithIndex.map { case (c, i) =>
      (i, c.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum)
    }.sortBy(_._2).take(2).map(_._1)
    val expectedCand = probeCells.map(cellRows.getOrElse(_, 0L)).sum - 1 // minus query vec if in a probed cell
    val cand = AnnIndex.probeIvf(spark, path, centroids, query,
      k = Int.MaxValue, nprobe = 2, excludeId = Some(0L)).count()
    assert(cand === expectedCand || cand === expectedCand + 1)
  }
}
