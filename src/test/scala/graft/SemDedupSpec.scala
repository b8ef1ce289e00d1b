package graft

import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._
import graft.operators.{KMeansQuant, SemDedup, Similarity}

/** SemDedup semantics: within-cell pairs equal the brute-force pair set
  * restricted to co-clustered ids, anchor-wins survival is exactly
  * "no lower-id neighbor", partitioning cannot move results, and the
  * per-cell quadratic guard trips loudly. Fixture-level value checks are
  * the DuckDB oracles (`q_semdedup_pairs` / `q_semdedup_keep`). */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf001)
  private lazy val model =
    KMeansQuant.fit(emb, "vec_id", "embedding", k = 3, iters = 2)
  private val Tau = 0.35

  test("pairs == exact all-pairs cosine restricted to co-clustered ids") {
    val cells = KMeansQuant.assign(emb, "vec_id", "embedding", model)
      .select($"vec_id", $"cluster").as[(Long, Long)].collect().toMap
    val exact = Similarity.nearDupPairs(emb, "vec_id", "embedding", Tau)
      .select($"id_a", $"id_b", $"cos").as[(Long, Long, Double)]
      .collect().filter { case (a, b, _) => cells(a) == cells(b) }
      .map { case (a, b, c) => (a, b) -> c }.toMap
    val got = SemDedup.pairs(emb, "vec_id", "embedding", model, Tau)
      .select($"cluster", $"id_a", $"id_b", $"cos")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty, "fixture produced no within-cell pairs at tau")
    assert(got.map { case (_, a, b, c) => (a, b) -> c }.toMap == exact)
    got.foreach { case (cell, a, b, _) =>
      assert(cells(a) == cell && cells(b) == cell)
    }
  }

  test("keep drops exactly the ids with a lower-id within-cell neighbor") {
    val dropped = SemDedup.pairs(emb, "vec_id", "embedding", model, Tau)
      .select($"id_b").as[Long].collect().toSet
    val kept = SemDedup.keep(emb, "vec_id", "embedding", model, Tau)
      .select($"vec_id").as[Long].collect().toSet
    val all = emb.select($"vec_id").as[Long].collect().toSet
    assert(kept == all -- dropped)
    assert(dropped.nonEmpty && kept.nonEmpty)
  }

  test("pairs and keep are partitioning-invariant") {
    val p1 = SemDedup.pairs(emb, "vec_id", "embedding", model, Tau)
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    val p2 = SemDedup.pairs(emb.repartition(7), "vec_id", "embedding",
        model, Tau)
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    assert(p1 == p2)
    val k1 = SemDedup.keep(emb, "vec_id", "embedding", model, Tau)
      .as[(Long, Long)].collect().sorted.toSeq
    val k2 = SemDedup.keep(emb.repartition(7), "vec_id", "embedding",
        model, Tau)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(k1 == k2)
  }

  test("an over-budget cell fails loudly, not quadratically") {
    val e = intercept[IllegalArgumentException] {
      SemDedup.pairs(emb, "vec_id", "embedding", model, Tau,
        maxCellRows = 3L).collect()
    }
    assert(e.getMessage.contains("maxCellRows"))
    assert(e.getMessage.contains("larger k"))
  }

  test("appendKeep guards the batch's touched cells the same way") {
    val cut = emb.agg(max($"vec_id")).head().getLong(0) / 2
    val e = intercept[IllegalArgumentException] {
      SemDedup.appendKeep(emb.filter($"vec_id" <= cut),
        emb.filter($"vec_id" > cut), "vec_id", "embedding", model, Tau,
        maxCellRows = 3L).collect()
    }
    assert(e.getMessage.contains("maxCellRows"))
    assert(e.getMessage.contains("larger k"))
  }

  test("survivors are pairwise non-duplicate within every cell") {
    // if x < y both survive, (x, y) can't be a pair — y's anchor check
    // would have dropped it; the survivor set is an independent set
    // under the pair relation, per the keep contract
    val kept = SemDedup.keep(emb, "vec_id", "embedding", model, Tau)
      .select($"vec_id").as[Long].collect().toSet
    val pairIds = SemDedup.pairs(emb, "vec_id", "embedding", model, Tau)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    pairIds.foreach { case (a, b) =>
      assert(!(kept(a) && kept(b)), s"surviving pair ($a, $b)")
    }
  }

  test("appendKeep == full-rebuild keep restricted to the new ids") {
    // split the id space: low ids are the ingested corpus, high ids the
    // arriving batch (the new-ids-exceed-old-ids ingestion contract)
    val cut = emb.agg(max($"vec_id")).head().getLong(0) / 2
    val old = emb.filter($"vec_id" <= cut)
    val fresh = emb.filter($"vec_id" > cut)
    val incr = SemDedup.appendKeep(old, fresh, "vec_id", "embedding",
        model, Tau)
      .as[(Long, Long)].collect().sorted.toSeq
    val rebuild = SemDedup.keep(emb, "vec_id", "embedding", model, Tau)
      .filter($"vec_id" > cut)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(incr == rebuild)
    assert(incr.nonEmpty)
    // and the old survivors are untouched by construction: rebuild over
    // old ∪ new restricted to old ids equals keep(old) alone
    val oldAlone = SemDedup.keep(old, "vec_id", "embedding", model, Tau)
      .as[(Long, Long)].collect().sorted.toSeq
    val oldInFull = SemDedup.keep(emb, "vec_id", "embedding", model, Tau)
      .filter($"vec_id" <= cut)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(oldAlone == oldInFull)
  }

  test("appendKeepFromIndex == appendKeep, with partition-pruned anchor read") {
    val cut = emb.agg(max($"vec_id")).head().getLong(0) / 2
    val old = emb.filter($"vec_id" <= cut)
    val fresh = emb.filter($"vec_id" > cut)
    val path = java.nio.file.Files
      .createTempDirectory("graft-semidx").toString + "/idx"
    KMeansQuant.buildIndex(old, "vec_id", "embedding", model, path)
    val served = SemDedup.appendKeepFromIndex(spark, path, fresh,
      "vec_id", "embedding", model, Tau)
    val inPlan = SemDedup.appendKeep(old, fresh, "vec_id", "embedding",
        model, Tau)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(served.as[(Long, Long)].collect().sorted.toSeq === inPlan)
    assert(inPlan.nonEmpty)
    // plan pin: the anchor scan carries cell PartitionFilters — the
    // untouched cells' partitions are pruned before any file opens
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("cell#"),
      s"expected a cell partition filter on the index scan:\n$plan")
    // and a batch landing in FEWER cells than the model has reads only
    // those partitions: a one-cell batch must not scan every cell dir
    val oneCellBatch = {
      val byCell = KMeansQuant.assign(fresh, "vec_id", "embedding", model)
        .select($"vec_id", $"cluster").as[(Long, Long)].collect()
      val target = byCell.groupBy(_._2).maxBy(_._2.length)._1
      val ids = byCell.filter(_._2 == target).map(_._1).toSet
      fresh.filter($"vec_id".isin(ids.toSeq: _*))
    }
    val pruned = SemDedup.appendKeepFromIndex(spark, path, oneCellBatch,
      "vec_id", "embedding", model, Tau)
    val prunedRebuild = SemDedup.appendKeep(old, oneCellBatch,
        "vec_id", "embedding", model, Tau)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(pruned.as[(Long, Long)].collect().sorted.toSeq === prunedRebuild)
  }

  test("appendKeep checks new vectors against dropped old anchors too") {
    // anchor-wins anchors on the PAIR set, not the survivor set: a new
    // vector duplicating an old vector that was itself dropped must
    // still be dropped. Isolating fixture on the unit circle: v1 at 15°
    // (cos(v0,v1) ≈ 0.966 ≥ 0.95 → v1 drops), batch v10 at 30° —
    // cos(v1,v10) ≈ 0.966 ≥ 0.95 but cos(v0,v10) ≈ 0.866 < 0.95, so
    // ONLY the dropped anchor v1 can drop v10: an appendKeep that
    // anchored on survivors alone would keep it and fail here. 1-cell
    // model keeps every pair within-cell.
    val m = KMeansQuant.Model(Array(Array(0L, 0L)))
    val old = Seq(
      0L -> Seq(1.0, 0.0),
      1L -> Seq(0.9659258, 0.2588190),  // 15°: dropped via v0
      5L -> Seq(0.0, 1.0)
    ).toDF("vec_id", "embedding")
    val fresh = Seq(
      10L -> Seq(0.8660254, 0.5),       // 30°: near ONLY dropped v1
      11L -> Seq(-1.0, 0.05)            // near nothing
    ).toDF("vec_id", "embedding")
    // fixture self-check: the isolation property the test relies on
    val keptOld = SemDedup.keep(old, "vec_id", "embedding", m, 0.95)
      .select($"vec_id").as[Long].collect().toSet
    assert(keptOld == Set(0L, 5L), s"v1 must drop in the old corpus: $keptOld")
    val kept = SemDedup.appendKeep(old, fresh, "vec_id", "embedding",
        m, threshold = 0.95)
      .select($"vec_id").as[Long].collect().toSet
    assert(kept == Set(11L),
      s"vec 10 duplicates a DROPPED anchor and must still drop: $kept")
  }

  test("streamed id-ordered batches through appendKeep == one-shot keep") {
    // The always-on ingestion shape: embedding batches land as files and
    // a foreachBatch sink folds appendKeep over the accumulated corpus.
    // Files get strictly increasing mtimes so the file source delivers
    // them in ingestion order (the id contract the operator documents).
    import org.apache.spark.sql.DataFrame
    val dir = java.nio.file.Files.createTempDirectory("graft-semdedup-stream")
    val ids = emb.agg(max($"vec_id")).head().getLong(0)
    val cuts = Seq(ids / 3, 2 * ids / 3)
    val parts = Seq(
      emb.filter($"vec_id" <= cuts(0)),
      emb.filter($"vec_id" > cuts(0) && $"vec_id" <= cuts(1)),
      emb.filter($"vec_id" > cuts(1)))
    parts.zipWithIndex.foreach { case (p, i) =>
      val stage = java.nio.file.Files.createTempDirectory("graft-semdedup-b")
      p.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = java.nio.file.Files.list(stage).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(fail(s"no parquet part in $stage"))
      val f = dir.resolve(s"b$i.parquet")
      java.nio.file.Files.copy(part, f)
      java.nio.file.Files.setLastModifiedTime(f,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
    }
    val schema = emb.schema
    var ingested: Option[DataFrame] = None
    val survivors = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.collect()
        val b = spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toSeq), schema)
        ingested match {
          case None =>
            survivors ++= SemDedup.keep(b, "vec_id", "embedding", model, Tau)
              .as[(Long, Long)].collect()
          case Some(old) =>
            survivors ++= SemDedup.appendKeep(old, b, "vec_id", "embedding",
              model, Tau).as[(Long, Long)].collect()
        }
        ingested = Some(ingested.fold(b)(_.unionByName(b)))
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    val oneShot = SemDedup.keep(emb, "vec_id", "embedding", model, Tau)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(survivors.sorted.toSeq == oneShot)
    assert(survivors.nonEmpty)
  }

  test("pair-search candidate count is Σ per-cell C(n,2), not global C(n,2)") {
    // the scale claim, verified by exact accounting: the equi-join on
    // the cell id enumerates only within-cell pairs — the global
    // quadratic never materializes
    val cellSizes = KMeansQuant.assign(emb, "vec_id", "embedding", model)
      .groupBy($"cluster").count().as[(Long, Long)].collect().map(_._2)
    val expected = cellSizes.map(c => c * (c - 1) / 2).sum
    val n = cellSizes.sum
    val cell = KMeansQuant.cellOf(col("embedding"), model)
    val e = emb.select(cell.as("cluster"), $"vec_id")
    val candidates = e.select($"cluster", $"vec_id".as("id_a"))
      .join(e.select($"cluster", $"vec_id".as("id_b")), Seq("cluster"))
      .filter($"id_a" < $"id_b").count()
    assert(candidates == expected)
    assert(expected < n * (n - 1) / 2,
      "fixture clustering degenerate: within-cell pairs == all pairs")
  }

  test("multi-probe pairs: superset of single-probe, exact on co-probed pairs, distinct") {
    val single = SemDedup.pairs(emb, "vec_id", "embedding", model, Tau)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val multi = SemDedup.pairsMultiProbe(emb, "vec_id", "embedding",
        model, Tau, nprobe = 2)
      .select($"id_a", $"id_b", $"cos").as[(Long, Long, Double)].collect()
    val multiIds = multi.map(t => (t._1, t._2)).toSet
    assert(multi.length == multiIds.size, "pair set must be distinct")
    assert(single.subsetOf(multiIds),
      "nprobe=2 must include every nprobe=1 pair")
    assert(multiIds.size > single.size,
      "fixture has boundary pairs; nprobe=2 must recover some")
    // exactness: equals brute force restricted to pairs sharing at
    // least one of their top-2 cells
    val cells2 = emb.select($"vec_id",
        KMeansQuant.cellsOf($"embedding", model, 2).as("cells"))
      .as[(Long, Seq[Long])].collect().toMap
    val expected = Similarity.nearDupPairs(emb, "vec_id", "embedding", Tau)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
      .filter { case (a, b) => cells2(a).exists(cells2(b).contains) }
      .toSet
    assert(multiIds == expected)
  }

  test("multi-probe survivors ⊆ single-probe survivors (more pairs, fewer keeps)") {
    val single = SemDedup.keep(emb, "vec_id", "embedding", model, Tau)
      .select($"vec_id").as[Long].collect().toSet
    val multi = SemDedup.keepMultiProbe(emb, "vec_id", "embedding",
        model, Tau, nprobe = 2)
      .select($"vec_id").as[Long].collect().toSet
    assert(multi.subsetOf(single))
    assert(multi.size < single.size,
      "recovered boundary pairs must drop additional duplicates")
    // dropped-set check: exactly the ids with a lower-id multiprobe pair
    val dropped = SemDedup.pairsMultiProbe(emb, "vec_id", "embedding",
        model, Tau, nprobe = 2)
      .select($"id_b").as[Long].collect().toSet
    val all = emb.select($"vec_id").as[Long].collect().toSet
    assert(multi == all -- dropped)
  }

  test("cellsOf(nprobe=1) agrees with the hard cellOf assignment") {
    val both = emb.select(
        KMeansQuant.cellOf($"embedding", model).as("hard"),
        KMeansQuant.cellsOf($"embedding", model, 1).as("soft"))
      .as[(Long, Seq[Long])].collect()
    both.foreach { case (hard, soft) => assert(soft == Seq(hard)) }
  }

  test("lowering tau only grows the pair set (monotone in the threshold)") {
    val tight = SemDedup.pairs(emb, "vec_id", "embedding", model, 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val loose = SemDedup.pairs(emb, "vec_id", "embedding", model, 0.3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(tight.subsetOf(loose))
    assert(loose.size > tight.size)
  }

  private def deconSplit = (
    emb.filter(pmod($"vec_id", lit(20)) =!= 0),
    emb.filter(pmod($"vec_id", lit(20)) === 0))

  test("decontaminate == brute-force drop restricted to shared probe cells") {
    val (corpus, evalSet) = deconSplit
    val probes = emb.select($"vec_id",
        KMeansQuant.cellsOf($"embedding", model, 2).as("cells"))
      .as[(Long, Seq[Long])].collect().toMap
    val evalIds = evalSet.select($"vec_id").as[Long].collect().toSet
    // exact cosines over every (corpus, eval) pair, both orders of
    // nearDupPairs' id_a < id_b normalization
    val exactDropped = Similarity.nearDupPairs(emb, "vec_id", "embedding", Tau)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .collect { case (c, e) if !evalIds(c) && evalIds(e) &&
        probes(c).intersect(probes(e)).nonEmpty => c }
      .toSet
    val kept = SemDedup.decontaminate(corpus, evalSet, "vec_id",
        "embedding", model, Tau)
      .select($"vec_id").as[Long].collect().toSet
    val corpusIds = corpus.select($"vec_id").as[Long].collect().toSet
    assert(exactDropped.nonEmpty, "fixture produced no contamination at tau")
    assert(kept == corpusIds -- exactDropped)
    assert(kept.intersect(evalIds).isEmpty)
  }

  test("decontaminate is partitioning-invariant") {
    val (corpus, evalSet) = deconSplit
    val k1 = SemDedup.decontaminate(corpus, evalSet, "vec_id",
      "embedding", model, Tau).as[Long].collect().sorted.toSeq
    val k2 = SemDedup.decontaminate(corpus.repartition(7),
      evalSet.repartition(3), "vec_id", "embedding", model, Tau)
      .as[Long].collect().sorted.toSeq
    assert(k1 == k2)
  }

  test("decontaminateFromIndex == its in-plan contract, partition-pruned") {
    val (corpus, evalSet) = deconSplit
    val path = java.nio.file.Files
      .createTempDirectory("graft-deconidx").toString + "/idx"
    KMeansQuant.buildIndex(corpus, "vec_id", "embedding", model, path)
    val served = SemDedup.decontaminateFromIndex(spark, path, model,
      evalSet, "vec_id", "embedding", Tau)
    // the in-plan statement of the SAME contract: corpus hard cell ∈
    // eval's probed-cell set, cos >= tau — computed from raw frames
    val hard = KMeansQuant.assign(corpus, "vec_id", "embedding", model)
      .select($"vec_id", $"cluster").as[(Long, Long)].collect().toMap
    val evProbes = evalSet.select($"vec_id",
        KMeansQuant.cellsOf($"embedding", model, 2))
      .as[(Long, Seq[Long])].collect().toMap
    val evalIds = evProbes.keySet
    val expect = graft.operators.Similarity
      .nearDupPairs(emb, "vec_id", "embedding", Tau)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .collect { case (c, e) if !evalIds(c) && evalIds(e) &&
        evProbes(e).contains(hard(c)) => c }
      .toSet
    assert(served.as[Long].collect().toSet == expect)
    assert(expect.nonEmpty, "fixture produced no served contamination")
    // plan pin: the layout scan is pruned to the eval batch's probed
    // cells before any file opens
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("cell#"),
      s"expected a cell partition filter on the index scan:\n$plan")
    // and the served contract ⊆ the both-sides-probed in-plan form's
    // dropped set (one-sided probing can only lose matches)
    val inPlanKept = SemDedup.decontaminate(corpus, evalSet, "vec_id",
      "embedding", model, Tau).as[Long].collect().toSet
    val corpusIds = corpus.select($"vec_id").as[Long].collect().toSet
    assert(expect.subsetOf(corpusIds -- inPlanKept))
  }

  test("an oversized eval side fails loudly instead of broadcasting it") {
    val (corpus, evalSet) = deconSplit
    val e = intercept[IllegalArgumentException] {
      SemDedup.decontaminate(corpus, evalSet, "vec_id", "embedding",
        model, Tau, maxEvalRows = 3L).collect()
    }
    assert(e.getMessage.contains("maxEvalRows"))
    assert(e.getMessage.contains("swap the arguments"))
  }
}
