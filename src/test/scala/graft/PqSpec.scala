package graft

import org.apache.spark.sql.functions._
import graft.operators.{KMeansQuant, Pq}

/** Product-quantization invariants beyond the oracle: the ADC identity
  * (ADC distance == exact grid-L2² to the reconstruction), code-range
  * sanity, and the loud divisibility guard. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf001)
  private lazy val pm = Pq.fit(emb, "vec_id", "embedding", m = 4, k = 8,
    iters = 2)

  test("codes are one row per (vector, subspace), each in [0, k)") {
    val c = Pq.codes(emb, "vec_id", "embedding", pm)
      .as[(Long, Long, Long)].collect()
    val n = emb.count()
    assert(c.length == n * pm.m)
    assert(c.forall { case (_, s, code) =>
      s >= 0 && s < pm.m && code >= 0 && code < pm.k })
    // every vector has exactly one code per subspace
    assert(c.groupBy(_._1).forall(_._2.map(_._2).sorted.toSeq ==
      (0L until pm.m.toLong)))
  }

  test("ADC top-k == driver-recomputed distance-to-reconstruction ranking") {
    // Reconstruct each vector from its codes; ADC to query must equal the
    // exact integer L2² between the quantized query and the
    // reconstruction — Jégou's asymmetric identity, bit-for-bit here
    // because everything lives on the integer grid.
    val queryId = 0L
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val qq = KMeansQuant.quantizeVec(q)
    val codes = Pq.codes(emb, "vec_id", "embedding", pm)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(_._3.toInt) }
    val expected = codes.collect { case (id, cs) if id != queryId =>
      val d2 = (0 until pm.m).map { s =>
        val cen = pm.books(s).centroids(cs(s))
        val qs = qq.slice(s * pm.dsub, (s + 1) * pm.dsub)
        qs.zip(cen).map { case (a, b) => val d = a - b; d * d }.sum
      }.sum
      (id, d2)
    }.toSeq.sortBy { case (id, d2) => (d2, id) }.take(10)
    val got = Pq.adcTopK(emb, "vec_id", "embedding", pm, queryId, 10)
      .as[(Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("IVF-PQ routing == driver-recomputed ADC over exactly the probed cells") {
    val queryId = 0L
    val coarse = KMeansQuant.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val qq = KMeansQuant.quantizeVec(q)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => val d = x - y; d * d }.sum
    val probed = coarse.centroids.zipWithIndex
      .map { case (cen, c) => (d2(qq, cen), c) }
      .sortBy(identity).take(2).map(_._2.toLong).toSet
    val members = KMeansQuant.assign(emb, "vec_id", "embedding", coarse)
      .as[(Long, Long, Long)].collect()
      .collect { case (id, cell, _) if probed(cell) => id }.toSet
    val codes = Pq.codes(emb, "vec_id", "embedding", pm)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(_._3.toInt) }
    val expected = codes.collect {
      case (id, cs) if id != queryId && members(id) =>
        val dist = (0 until pm.m).map { s =>
          d2(qq.slice(s * pm.dsub, (s + 1) * pm.dsub),
            pm.books(s).centroids(cs(s)))
        }.sum
        (id, dist)
    }.toSeq.sortBy { case (id, dist) => (dist, id) }.take(10)
    val got = Pq.adcTopKRouted(emb, "vec_id", "embedding", pm, coarse,
      queryId, 10, nprobe = 2).as[(Long, Long)].collect().toSeq
    assert(got == expected)
    // the routing must actually prune: fewer members than the corpus
    assert(members.size < emb.count())
  }

  test("fit fails loudly when m does not divide the dimension") {
    val e = intercept[IllegalArgumentException] {
      Pq.fit(emb, "vec_id", "embedding", m = 5, k = 4, iters = 1)
    }
    assert(e.getMessage.contains("subspaces"))
  }

  test("a missing query id fails loudly, naming the id") {
    val e = intercept[IllegalArgumentException] {
      Pq.adcTopK(emb, "vec_id", "embedding", pm, queryId = -12345L, 10).count()
    }
    assert(e.getMessage.contains("-12345"))
  }

  test("subspace codebooks equal KMeansQuant.fit on the sliced projection") {
    // fit() must be exactly the composition it claims — no drift between
    // the PQ path and the oracle's per-subspace unrolled mirror.
    val direct = KMeansQuant.fit(
      emb.select(col("vec_id"),
        slice(col("embedding"), 17, 16).as("embedding")),
      "vec_id", "embedding", k = 8, iters = 2)
    assert(pm.books(1).centroids.map(_.toSeq).toSeq ==
      direct.centroids.map(_.toSeq).toSeq)
  }
}
