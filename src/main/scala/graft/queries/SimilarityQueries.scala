package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{MinHashDedup, SimHash, Similarity, TokenOps}

/** Similarity search + near-duplicate detection (SURVEY.md §2.7, §7 step 7).
  *
  * Oracle-checkable: exact brute-force cosine top-k, exact all-pairs
  * embedding near-dups, exact shingle-Jaccard pairs (the ground truth the
  * LSH variants are property-tested against). Rows-only: MinHash-LSH,
  * SimHash, hyperplane ANN (xxhash64/plane-dependent — verified by recall
  * properties in SimilaritySpec instead).
  */
object SimilarityQueries extends QueryModule {

  val queries: Map[String, Q] = Map(
    // Exact top-10 nearest to vec_id=0 by cosine (broadcast query row).
    "q_cosine_topk" -> ((s, d) =>
      Similarity.bruteForceTopK(Tables.embeddings(s, d),
        "vec_id", "embedding", queryId = 0L, k = 10)),

    // Exact all-pairs embedding near-dups (cosine >= 0.5).
    "q_embed_neardup" -> ((s, d) =>
      Similarity.nearDupPairs(Tables.embeddings(s, d),
          "vec_id", "embedding", 0.5)
        .orderBy(col("id_a"), col("id_b"))),

    // Exact 3-gram shingle Jaccard pairs >= 0.5 (near-dup ground truth),
    // count-based inverted-index join: explode → self-join on shingle →
    // count intersections → |A∪B| = |A|+|B|−|∩|. On this fixture's tiny
    // uniform vocabulary this beats prefix filtering
    // (MinHashDedup.exactJaccardPairs, the better shape for Zipfian
    // corpora, measured 2.5x slower here) because no shingle is rare.
    "q_jaccard_pairs" -> ((s, d) => {
      // Join on xxhash64(shingle), not the shingle string: 8-byte fixed
      // keys shrink the shuffled self-join (the dominant cost) and hash
      // exact-match faster; a 64-bit collision within one corpus'
      // shingle set (~1e5 distinct) is ~1e-9-probable and the oracle
      // hash-compare would surface it.
      val ds = Tables.documents(s, d).select(col("doc_id"),
        explode(MinHashDedup.shingles(TokenOps.tokenize(col("text")), 3)).as("sh"))
        .select(col("doc_id"), xxhash64(col("sh")).as("s"))
      val sizes = ds.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = ds.as("a")
        .join(ds.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("ni"))
      inter
        .join(broadcast(sizes.select(col("doc_id").as("id_a"), col("n").as("na"))), "id_a")
        .join(broadcast(sizes.select(col("doc_id").as("id_b"), col("n").as("nb"))), "id_b")
        .withColumn("jaccard", round(
          col("ni").cast("double") / (col("na") + col("nb") - col("ni")), 6))
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // MinHash+LSH near-dups (32 hashes, 8 bands) — rows-only; recall vs
    // q_jaccard_pairs ground truth is property-tested.
    "q_minhash_neardup" -> ((s, d) =>
      MinHashDedup.nearDuplicates(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("id_a"), col("id_b"))),

    // SimHash fingerprints — rows-only (xxhash64-dependent).
    "q_simhash" -> ((s, d) =>
      SimHash.simhashAgg(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // IVF ANN: k-means coarse quantizer, probe half the cells — rows-only
    // (k-means fit); full-probe==brute-force equality is property-tested.
    "q_ivf_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
      val model = graft.ml.IvfIndex.fit(
        emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", nlist = 8)
      graft.ml.IvfIndex.topK(model, "vec_id", q, k = 10, nprobe = 4)
    }),

    // Hyperplane-LSH ANN top-10 for vec_id=0's vector — rows-only;
    // recall vs q_cosine_topk is property-tested.
    "q_ann_topk" -> ((s, d) => {
      val q = Tables.embeddings(s, d).filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
      Similarity.annTopK(
        Tables.embeddings(s, d).filter(col("vec_id") =!= 0),
        "vec_id", "embedding", q, k = 10)
    })
  )

  val oracle: Map[String, String] = Map(
    "q_cosine_topk" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id <> 0)
        |SELECT vec_id, round(list_dot_product(v, qv)
        |  / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos
        |FROM e CROSS JOIN q
        |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,

    "q_embed_neardup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_dot_product(a.v, b.v)
        |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.v, b.v)
        |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    "q_jaccard_pairs" ->
      """WITH toks AS (SELECT doc_id,
        |  regexp_split_to_array(lower(text), '\s+') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
        |       FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ni
        |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  round(ni * 1.0 / (sa.n + sb.n - ni), 6) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE round(ni * 1.0 / (sa.n + sb.n - ni), 6) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin
  )
}
