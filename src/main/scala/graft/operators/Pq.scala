package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.KMeansQuant.Model

/** Product quantization for ANN search (Jégou, Douze, Schmid — "Product
  * quantization for nearest neighbor search", TPAMI 2011): split the
  * embedding into `m` contiguous subvectors, learn a small codebook per
  * subspace, and represent every vector by its `m` codeword ids — the
  * memory layout that makes billion-vector search fit in RAM (m·log2(k)
  * bits per vector instead of dim·32).
  *
  * Query scoring is ADC (asymmetric distance computation): the query
  * stays UNQUANTIZED; a per-subspace distance table `dtab[s][c] =
  * ||q_s - codeword_{s,c}||²` (m·k entries, computed once on the
  * driver) turns each row's distance into `m` table lookups + adds —
  * scan-stage, row-local, zero shuffles, and the final top-k is a
  * TakeOrderedAndProject.
  *
  * Built on [[KMeansQuant]]'s grid-exact deterministic Lloyd's, so unlike
  * classic PQ the whole stack — codebooks, codes, ADC distances — is
  * bit-reproducible and DuckDB-oracle-checkable: every distance is an
  * exact integer on the 1e-6 micro-grid. ADC here is EXACTLY the squared
  * L2 distance between the query and each row's RECONSTRUCTION (the
  * concatenated codewords) — the identity PqSpec pins.
  *
  * Scale notes (100 TB): training touches only `iters` aggregation passes
  * per subspace (k·dsub rows of state each); encoding is row-local
  * against broadcast literal codebooks; serving ships m·k longs of dtab
  * in the plan. Compose with [[KMeansQuant.ivfTopK]]'s cell routing for
  * IVF-PQ: route to nprobe cells, ADC-score only those partitions.
  */
object Pq {

  /** Fitted product quantizer: `books(s)` is subspace s's codebook on the
    * micro-grid; all subspaces share k and the subvector width. */
  final case class PqModel(books: Array[Model]) {
    def m: Int = books.length
    def k: Int = books.headOption.map(_.k).getOrElse(0)
    def dsub: Int = books.headOption.map(_.dim).getOrElse(0)
  }

  private def subVec(vecCol: String, s: Int, dsub: Int): Column =
    slice(col(vecCol), s * dsub + 1, dsub)

  /** Train one grid-exact codebook per subspace (same min-id init and
    * HALF_UP update discipline as [[KMeansQuant.fit]], applied to the
    * sliced projection — determinism is inherited, not re-proven). */
  def fit(emb: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int): PqModel = {
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    require(m > 0 && dim % m == 0,
      s"dim $dim must divide into m=$m equal subspaces")
    val dsub = dim / m
    PqModel((0 until m).toArray.map { s =>
      KMeansQuant.fit(
        emb.select(col(idCol), subVec(vecCol, s, dsub).as(vecCol)),
        idCol, vecCol, k, iters)
    })
  }

  /** Long-format codes: (id, sub, code) — one row per (vector, subspace).
    * All m assignments happen in ONE scan (an m-element array per row,
    * then posexplode) — a per-subspace union would re-read the corpus m
    * times. Row-local against the broadcast literal codebooks. */
  def codes(emb: DataFrame, idCol: String, vecCol: String,
      pm: PqModel): DataFrame = {
    val codeCols = (0 until pm.m).map { s =>
      val vq = KMeansQuant.quantize(subVec(vecCol, s, pm.dsub))
      graft.functions.KMeansAssignExprs.nearestCell(vq, pm.books(s).centroids)
        .getField("c")
    }
    emb.select(col(idCol),
        posexplode(array(codeCols: _*)).as(Seq("sub", "code")))
      .select(col(idCol), col("sub").cast("long").as("sub"), col("code"))
  }

  /** Exact integer ||q_s - codeword||² table for one subspace. */
  private def dtab(qSub: Array[Long], book: Model): Array[Long] =
    book.centroids.map { cen =>
      var acc = 0L
      var i = 0
      while (i < cen.length) { val d = qSub(i) - cen(i); acc += d * d; i += 1 }
      acc
    }

  /** The quantized query vector (one bounded 1-row collect). Loud on a
    * missing id — every PQ serving entry point routes through here, and
    * an opaque NoSuchElementException from head() would not name the
    * query. */
  private def queryQuant(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long): Array[Long] = {
    val row = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>")).limit(1).collect()
      .headOption
    require(row.isDefined,
      s"PQ query id $queryId not found in column '$idCol' of the " +
        "embeddings frame — nothing to serve.")
    KMeansQuant.quantizeVec(row.get.getSeq[Double](0))
  }

  /** Row-local ADC distance column: Σ_s dtab[s][code_s], the m·k table
    * entries riding the plan as literals. */
  private def adcCol(vecCol: String, pm: PqModel,
      qQuant: Array[Long]): Column =
    (0 until pm.m).map { s =>
      val tab = dtab(qQuant.slice(s * pm.dsub, (s + 1) * pm.dsub), pm.books(s))
      val vq = KMeansQuant.quantize(subVec(vecCol, s, pm.dsub))
      val code = graft.functions.KMeansAssignExprs
        .nearestCell(vq, pm.books(s).centroids).getField("c")
      // dtab lookup: element_at is 1-based; code is 0-based
      element_at(array(tab.map(lit(_)).toIndexedSeq: _*), (code + 1).cast("int"))
    }.reduce(_ + _)

  /** ADC top-k: the k ids with the smallest Σ_s dtab[s][code_s] — equal
    * to the exact grid-L2² against each row's reconstruction. The query
    * row (1 row, bounded) is collected to build the m·k-entry table;
    * everything else is scan-stage. */
  def adcTopK(emb: DataFrame, idCol: String, vecCol: String, pm: PqModel,
      queryId: Long, k: Int): DataFrame = {
    val qQuant = queryQuant(emb, idCol, vecCol, queryId)
    emb.filter(col(idCol) =!= queryId)
      .select(col(idCol), adcCol(vecCol, pm, qQuant).as("d2"))
      .orderBy(col("d2"), col(idCol))
      .limit(k)
  }

  /** Two-stage serving: ADC shortlist → EXACT re-rank (Jégou et al.
    * §V.C's refinement stage — the production answer to PQ's lossy
    * distances): take the `shortlist` best by ADC, then re-score only
    * those against the query with the exact grid distance and cut to k.
    * The shortlist is bounded (≤ a few hundred ids), so it broadcasts
    * into a semi-join and the re-rank touches `shortlist` rows, not the
    * corpus. Exact distance reuses the codegen'd nearest-cell kernel
    * with the query as a 1-row matrix — same integer math the oracle
    * mirrors. */
  def refineTopK(emb: DataFrame, idCol: String, vecCol: String,
      pm: PqModel, queryId: Long, k: Int, shortlist: Int = 100): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k=$k")
    val qQuant = queryQuant(emb, idCol, vecCol, queryId)
    val short = adcTopK(emb, idCol, vecCol, pm, queryId, shortlist)
      .select(col(idCol))
    val exactD2 = graft.functions.KMeansAssignExprs
      .nearestCell(KMeansQuant.quantize(col(vecCol)), Array(qQuant))
      .getField("d")
    emb.join(broadcast(short), Seq(idCol), "leftsemi")
      .select(col(idCol), exactD2.as("d2"))
      .orderBy(col("d2"), col(idCol))
      .limit(k)
  }

  /** IVF-PQ serving (the IVFADC shape — Jégou et al. §IV; non-residual
    * variant: codes quantize the raw vectors, so the same codebooks and
    * codes serve both the routed and the exhaustive path): rank the
    * coarse quantizer's cells by exact integer distance to the query
    * (driver-side — k_coarse cells, bounded), then ADC-score ONLY the
    * nprobe nearest cells' members. The cell filter is the same
    * row-local nearest-cell argmin the corpus was assigned with — over a
    * cell-partitioned layout ([[KMeansQuant.buildIndex]]) it becomes
    * partition pruning; either way no shuffle, and the scan does
    * 1/nlist·nprobe of the ADC work. */
  def adcTopKRouted(emb: DataFrame, idCol: String, vecCol: String,
      pm: PqModel, coarse: Model, queryId: Long, k: Int,
      nprobe: Int): DataFrame = {
    val qQuant = queryQuant(emb, idCol, vecCol, queryId)
    val probed = coarse.centroids.zipWithIndex.map { case (cen, c) =>
      var acc = 0L
      var i = 0
      while (i < cen.length) { val d = qQuant(i) - cen(i); acc += d * d; i += 1 }
      (acc, c)
    }.sortBy(identity).take(nprobe).map(_._2.toLong).toSeq
    val cell = graft.functions.KMeansAssignExprs
      .nearestCell(KMeansQuant.quantize(col(vecCol)), coarse.centroids)
      .getField("c")
    emb.filter(col(idCol) =!= queryId)
      .filter(cell.isin(probed: _*))
      .select(col(idCol), adcCol(vecCol, pm, qQuant).as("d2"))
      .orderBy(col("d2"), col(idCol))
      .limit(k)
  }
}
