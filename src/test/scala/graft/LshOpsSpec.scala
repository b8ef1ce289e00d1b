package graft

import org.apache.spark.ml.feature.{HashingTF, IDF, Tokenizer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.functions._
import graft.ml.LshOps

class LshOpsSpec extends SparkSpec {
  import spark.implicits._

  test("MLlib MinHashLSH finds the planted near-dup pairs (recall >= 0.8)") {
    val exact = SparkEntry.queries("q_jaccard_pairs")(spark, sf001)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val lsh = LshOps.minHashNearDups(Tables.documents(spark, sf001),
        "doc_id", "text", maxDistance = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall exact=${exact.size} lsh=${lsh.size}")
  }

  test("BucketedRandomProjectionLSH self-join returns plausible neighbor pairs") {
    val out = LshOps.euclideanNearest(Tables.embeddings(spark, sf001),
      "vec_id", "embedding", threshold = 1.2)
    val n = out.count()
    assert(n > 0, "no pairs under distance threshold")
    assert(out.filter($"euclidean_distance" < 0).count() === 0)
  }

  test("single-query approxNearestNeighbors: self is its own nearest neighbor") {
    val docs = Tables.documents(spark, sf001)
    val probe = docs.orderBy($"doc_id").select($"doc_id", $"text")
      .head()
    val out = LshOps.minHashNearestNeighbors(docs, "doc_id", "text",
      probe.getString(1), k = 3)
    val top = out.orderBy($"jaccard_distance", $"doc_id")
      .head()
    assert(top.getLong(0) === probe.getLong(0),
      s"query doc ${probe.getLong(0)} not its own nearest (got $top)")
    assert(top.getDouble(1) === 0.0)
  }

  test("single-query euclidean ANN: the query's own vector comes back at distance 0") {
    val emb = Tables.embeddings(spark, sf001)
    val q = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val out = LshOps.euclideanNearestNeighbors(emb, "vec_id", "embedding",
      q, k = 3)
    val top = out.orderBy($"euclidean_distance", $"vec_id").head()
    assert(top.getLong(0) === 0L)
    assert(top.getDouble(1) === 0.0)
  }

  test("IDF.fit matches the relational formula log((N+1)/(df+1)) with minDocFreq") {
    // Cross-checks the MLlib estimator against q_term_df's semantics
    // (SURVEY.md §2.5 M4) on a hand-built corpus using term positions
    // pinned via HashingTF on distinct single-term docs.
    val docs = Seq(
      "alpha beta", "alpha beta", "alpha beta gamma", "alpha", "alpha beta",
      "alpha delta", "delta beta", "alpha", "beta", "alpha beta")
      .toDF("text") // N=10; df(alpha)=8, df(beta)=7, df(gamma)=1, df(delta)=2
    val tok = new Tokenizer().setInputCol("text").setOutputCol("words")
    val tf = new HashingTF().setInputCol("words").setOutputCol("rawf")
      .setNumFeatures(1 << 10)
    val idf = new IDF().setInputCol("rawf").setOutputCol("feat").setMinDocFreq(2)
    val withTf = tf.transform(tok.transform(docs))
    val model = idf.fit(withTf)
    val idfVec = model.idf.toArray
    def bucket(term: String): Int = {
      val v = tf.transform(tok.transform(Seq(term).toDF("text")))
        .select(vector_to_array($"rawf")).as[Seq[Double]].head()
      v.indexWhere(_ > 0)
    }
    val n = 10.0
    assert(math.abs(idfVec(bucket("alpha")) - math.log((n + 1) / (8 + 1))) < 1e-9)
    assert(math.abs(idfVec(bucket("beta")) - math.log((n + 1) / (7 + 1))) < 1e-9)
    assert(idfVec(bucket("gamma")) === 0.0, "df < minDocFreq must zero the weight")
    assert(math.abs(idfVec(bucket("delta")) - math.log((n + 1) / (2 + 1))) < 1e-9)
  }
}
