package graft.ml

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, CountVectorizer, MinHashLSH}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{MinHashDedup, TokenOps}

/** MLlib LSH wrappers — the Estimator-based alternative to the custom
  * expression-level LSH in graft.operators (SURVEY.md §2.7: "MinHashLSH
  * over CountVectorizer shingles, approxSimilarityJoin").
  *
  * Trade-off vs the custom operators: MLlib LSH needs a fitting job and
  * vector columns (CountVectorizer vocabulary → one extra pass + a
  * driver-held vocab), but plugs into approxSimilarityJoin/approxNearest
  * Neighbors directly. The expression-level forms (MinHashDedup,
  * Similarity.annTopK) are fit-free and stay in codegen; prefer them in
  * pipelines, use these when interoperating with MLlib versions of the
  * data.
  */
object LshOps {

  /** MinHashLSH near-dup join over 3-gram shingle vectors.
    * Returns (id_a, id_b, jaccard_distance<=maxDistance). */
  def minHashNearDups(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numTables: Int = 8,
      maxDistance: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol),
      MinHashDedup.shingles(TokenOps.tokenize(col(textCol)), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
    val cv = new CountVectorizer().setInputCol("sh").setOutputCol("features")
      .setBinary(true)
    val cvModel = cv.fit(sh)
    val vecs = cvModel.transform(sh)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numTables).setSeed(42L)
    val model = lsh.fit(vecs)
    model.approxSimilarityJoin(vecs, vecs, maxDistance, "dist")
      .filter(col(s"datasetA.$idCol") < col(s"datasetB.$idCol"))
      .select(col(s"datasetA.$idCol").as("id_a"),
        col(s"datasetB.$idCol").as("id_b"),
        round(col("dist"), 6).as("jaccard_distance"))
  }

  /** Single-query approximate nearest neighbors via MLlib MinHashLSH
    * (the approxNearestNeighbors side of the API; the join form above
    * covers all-pairs). `queryText` is shingled with the same pipeline
    * the index was built with. */
  def minHashNearestNeighbors(df: DataFrame, idCol: String, textCol: String,
      queryText: String, k: Int, shingleN: Int = 3,
      numTables: Int = 8): DataFrame = {
    val sh = df.select(col(idCol),
      MinHashDedup.shingles(TokenOps.tokenize(col(textCol)), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
    val cvModel = new CountVectorizer().setInputCol("sh")
      .setOutputCol("features").setBinary(true).fit(sh)
    val vecs = cvModel.transform(sh)
    val model = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numTables).setSeed(42L).fit(vecs)
    val qv = cvModel.transform(
      df.sparkSession.createDataFrame(Seq(Tuple1(queryText)))
        .toDF(textCol)
        .select(MinHashDedup.shingles(
          TokenOps.tokenize(col(textCol)), shingleN).as("sh")))
      .select(col("features")).head().getAs[org.apache.spark.ml.linalg.Vector](0)
    // MinHashLSH requires >= 1 nonzero entry; a query shorter than
    // shingleN tokens (or sharing no shingle with the fitted vocabulary)
    // has none -> defined empty result instead of a runtime crash.
    if (qv.numNonzeros == 0)
      vecs.select(col(idCol), lit(0.0).as("jaccard_distance")).limit(0)
    else
      model.approxNearestNeighbors(vecs, qv, k, "dist")
        .select(col(idCol), round(col("dist"), 6).as("jaccard_distance"))
  }

  /** Single-query ANN over the embedding column (euclidean LSH). */
  def euclideanNearestNeighbors(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, numTables: Int = 4,
      bucketLength: Double = 1.0): DataFrame = {
    val vecs = df.select(col(idCol),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val model = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numTables).setBucketLength(bucketLength).setSeed(42L)
      .fit(vecs)
    model.approxNearestNeighbors(vecs,
        org.apache.spark.ml.linalg.Vectors.dense(query.toArray), k, "dist")
      .select(col(idCol), round(col("dist"), 6).as("euclidean_distance"))
  }

  /** Euclidean-LSH ANN join over the embedding column. */
  def euclideanNearest(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numTables: Int = 4,
      bucketLength: Double = 1.0): DataFrame = {
    val vecs = df.select(col(idCol),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numTables).setBucketLength(bucketLength).setSeed(42L)
    val model = lsh.fit(vecs)
    model.approxSimilarityJoin(vecs, vecs, threshold, "dist")
      .filter(col(s"datasetA.$idCol") < col(s"datasetB.$idCol"))
      .select(col(s"datasetA.$idCol").as("id_a"),
        col(s"datasetB.$idCol").as("id_b"),
        round(col("dist"), 6).as("euclidean_distance"))
  }
}
