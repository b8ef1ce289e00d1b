package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Bm25, Rerank, Similarity, TokenOps}

/** Hybrid retrieval (SURVEY.md §2.7): BM25 lexical scoring over
  * `documents` + reciprocal-rank fusion with dense cosine retrieval over
  * `embeddings` (`doc_id` and `vec_id` are the same id space — see
  * FIXTURES.md). Both queries are fully deterministic closed forms, so
  * both are DuckDB-oracle-checked — including the fusion, where the id
  * spaces only partially overlap at sf0.1 (5k docs vs 2k vectors) and the
  * full-outer RRF semantics are exactly what the oracle exercises.
  *
  * The fixed query: terms chosen for document-frequency spread at every
  * sf (`dup` is ~20× rarer than `spark`/`window` → dominant idf), plus
  * vec_id 0's embedding as the dense query vector (the same query row the
  * ANN family probes with).
  */
object RetrievalQueries extends QueryModule {

  private[queries] val terms = Seq("spark", "window", "dup")
  private val k1 = 1.2
  private val b = 0.75
  private val topN = 50 // candidate-list bound per retriever before fusion
  private val rerankW = Rerank.Weights() // shared with the oracle mirror
  private val MmrK = 8
  private val MmrLambda = 0.7 // mirror interpolates λ and the COMPUTED 1−λ

  /** One postings-index build per (session, dataset); probes then read
    * pruned bucket partitions (same memoization discipline as
    * SimilarityQueries.IndexCache: UUID dir per build —
    * [[graft.util.IndexPaths]] — weakly session-keyed, dies with the
    * tmp dir). */
  private val postingsCache = new graft.util.SessionCache[String]
  private def postingsIndex(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    postingsCache.getOrElseUpdate(s, d) {
      val p = graft.util.IndexPaths.fresh(d, "bm25-postings")
      Bm25.buildPostings(Tables.documents(s, d), "doc_id", "text", p)
      // the doc-keyed twin rides the same build (same tf rows, second
      // layout) — the served PRF's expansion probe prunes against it
      Bm25.buildDocPostings(Tables.documents(s, d), "doc_id", "text", p)
      p
    }

  /** The retrieve→fuse pipeline, cut to `k` fused candidates — shared by
    * the fusion query (k=10, the result) and the rerank query (k=20, the
    * candidate list). */
  private def fusedTopK(s: org.apache.spark.sql.SparkSession, d: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    val lex = Bm25.ranked(
      Bm25.topK(Tables.documents(s, d), "doc_id", "text", terms,
        k = topN, k1 = k1, b = b),
      Seq(col("bm25").desc, col("doc_id")), "lex_rank")
    val dense = Bm25.ranked(
      Similarity.bruteForceTopK(Tables.embeddings(s, d),
          "vec_id", "embedding", queryId = 0L, k = topN)
        .withColumnRenamed("vec_id", "doc_id"),
      Seq(col("cos").desc, col("doc_id")), "dense_rank")
    Bm25.rrfFuse(lex, dense, "doc_id")
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }

  /** The same layout built INCREMENTALLY: even doc_ids as the base
    * build, odd doc_ids folded in by `appendPostings` — the serving
    * path's continuous-ingestion shape. Shares q_postings_build's
    * oracle SQL: the merged index must equal a full-corpus build. */
  /** Memoized MATERIALIZED fused top-20 (the jaccardPairs discipline):
    * q_hybrid_rrf, q_rerank_linear, q_mmr_select, q_retrieval_eval, and
    * q_retrieval_ndcg all consume this one candidate list — re-running
    * the lex+dense retrieve per query is pure waste. Weakly
    * session-keyed; the one-time build is a Bench warmup so timed
    * queries measure the candidate-bounded stage they own. */
  private val fusedCache =
    new graft.util.SessionCache[org.apache.spark.sql.DataFrame]
  private def fused20(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    fusedCache.getOrElseUpdate(s, d)(fusedTopK(s, d, 20).localCheckpoint())

  /** The eval loop's shared construction: the three ranked top-10 lists
    * (lexical BM25 / RRF-fused / reranked) plus the ≥2-query-terms
    * relevance set and its count — q_retrieval_eval scores recall/MRR
    * off it, q_retrieval_ndcg the log-discounted gains. ONE fused
    * pipeline feeds the fused and reranked lists: the top-10 is a
    * prefix of the checkpointed top-20 by construction (same ordering,
    * different cut), so the lex+dense retrieve never runs twice. */
  private val evalCache = new graft.util.SessionCache[
    (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame)]
  private def evalLists(s: org.apache.spark.sql.SparkSession, d: String) =
    evalCache.getOrElseUpdate(s, d) {
      val (lists, rel, _) = evalListsPlan(s, d)
      // lists is ≤30 rows, rel is the relevance id set — both tiny;
      // materialize once so recall/MRR and nDCG are pure aggregates.
      // nRel MUST derive from the checkpointed rel: the plan-form count
      // would re-run the corpus-wide tokenize scan on every consumer
      // (the review catch) — off the checkpoint it's a 1-row fold over
      // the tiny id set.
      val relCp = rel.localCheckpoint()
      (lists.localCheckpoint(), relCp,
        relCp.agg(count(lit(1)).as("n_relevant")))
    }

  private def evalListsPlan(s: org.apache.spark.sql.SparkSession, d: String) = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val rel = docs.select(col("doc_id"),
        size(array_intersect(
          array_distinct(TokenOps.tokenize(col("text"))),
          array(terms.map(lit): _*))).as("nm"))
      .filter(col("nm") >= 2)
      .select(col("doc_id"))
    val nRel = rel.agg(count(lit(1)).as("n_relevant"))
    def rankedList(df: org.apache.spark.sql.DataFrame,
        score: org.apache.spark.sql.Column, m: String) =
      df.select(col("doc_id"),
          row_number().over(Window.orderBy(score.desc, col("doc_id")))
            .as("rank"))
        .withColumn("method", lit(m))
    val lex = Bm25.topK(docs, "doc_id", "text", terms, k = 10,
      k1 = k1, b = b)
    val f20 = fused20(s, d)
    val fused = f20.orderBy(col("rrf").desc, col("doc_id")).limit(10)
    val rr = Rerank.linear(f20,
      docs, Tables.embeddings(s, d), "doc_id", "text",
      "vec_id", "embedding", queryId = 0L, terms = terms, k = 10,
      w = rerankW, k1 = k1, b = b)
    val lists = rankedList(lex, col("bm25"), "bm25")
      .unionAll(rankedList(fused, col("rrf"), "rrf"))
      .unionAll(rankedList(rr, col("rerank"), "rerank"))
    (lists, rel, nRel)
  }

  private val incrCache = new graft.util.SessionCache[String]
  private def incrementalIndex(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    incrCache.getOrElseUpdate(s, d) {
      val p = graft.util.IndexPaths.fresh(d, "bm25-postings-incr")
      val docs = Tables.documents(s, d)
      Bm25.buildPostings(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", p)
      Bm25.appendPostings(docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", p)
      p
    }

  /** The add-then-delete round trip: full-corpus build, a shifted-id
    * copy of every document appended, then deleted again — the served
    * index must be bit-indistinguishable from the never-added build, so
    * BOTH deleted-index queries share the full-corpus mirrors. */
  private val delCache = new graft.util.SessionCache[String]
  private def deletedIndex(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    delCache.getOrElseUpdate(s, d) {
      val p = graft.util.IndexPaths.fresh(d, "bm25-postings-del")
      val docs = Tables.documents(s, d)
      Bm25.buildPostings(docs, "doc_id", "text", p)
      val delta = docs.select((col("doc_id") + lit(10000000L)).as("doc_id"),
        col("text"))
      Bm25.appendPostings(delta, "doc_id", "text", p)
      Bm25.deletePostings(delta.select(col("doc_id")), "doc_id", p)
      p
    }

  /** The replace (re-crawl upsert) round trip: the index starts WRONG —
    * every doc_id % 3 == 0 document indexed with corrupted (reversed)
    * text, every doc_id % 5 == 0 document missing entirely — then ONE
    * `replacePostings` call upserts the true text for both sets. The
    * served index must be bit-indistinguishable from a full-corpus
    * build, so both replaced-index queries share the full-corpus
    * mirrors (the deletedIndex discipline, exercising BOTH verb arms:
    * replace-existing and insert-missing). */
  private val replCache = new graft.util.SessionCache[String]
  private def replacedIndex(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    replCache.getOrElseUpdate(s, d) {
      val p = graft.util.IndexPaths.fresh(d, "bm25-postings-repl")
      val docs = Tables.documents(s, d)
      val corrupted = docs
        .filter(col("doc_id") % 5 =!= 0)
        .withColumn("text", when(col("doc_id") % 3 === 0,
          reverse(col("text"))).otherwise(col("text")))
      Bm25.buildPostings(corrupted, "doc_id", "text", p)
      // the doc-keyed twin is built BEFORE the replace (on the corrupted
      // corpus) and MAINTAINED through it — q_prf_repl_topk then shares
      // the never-corrupted PRF mirror, so twin-through-replace
      // bit-exactness is oracle-checked, not just specced
      Bm25.buildDocPostings(corrupted, "doc_id", "text", p)
      Bm25.replacePostings(
        docs.filter(col("doc_id") % 3 === 0 || col("doc_id") % 5 === 0),
        "doc_id", "text", p)
      p
    }

  /** One-time index materializations, forced untimed by Bench so the
    * timed queries measure the SERVING path (pruned reads + broadcast
    * probe), not a corpus build — the kmeans/PQ/BPE warm discipline. */
  override val warmups: Map[String, (org.apache.spark.sql.SparkSession,
      String) => Unit] = Map(
    "bm25_postings" -> ((s, d) => { postingsIndex(s, d); () }),
    "bm25_incr" -> ((s, d) => { incrementalIndex(s, d); () }),
    "bm25_del" -> ((s, d) => { deletedIndex(s, d); () }),
    "bm25_repl" -> ((s, d) => { replacedIndex(s, d); () }),
    "fused_topk" -> ((s, d) => { fused20(s, d); () }),
    "eval_lists" -> ((s, d) => { evalLists(s, d); () }))

  val queries: Map[String, Q] = Map(
    // BM25 top-10: one singleton corpus-stats aggregate, broadcast back,
    // row-local scoring, TakeOrderedAndProject. Zero wide shuffles.
    "q_bm25_topk" -> ((s, d) =>
      Bm25.topK(Tables.documents(s, d), "doc_id", "text", terms, k = 10,
        k1 = k1, b = b)),

    // Exact phrase search (operators/PhraseSearch): every occurrence of
    // "slow hash batch" AS A CONSECUTIVE SEQUENCE — the positional-
    // intersection verb bag-of-words BM25 cannot answer. Legs intersect
    // rarest-first on (doc_id, pos-offset) equi-joins, each leg
    // df-sized. The mirror re-derives every occurrence from the raw
    // token arrays.
    "q_phrase_search" -> ((s, d) =>
      graft.operators.PhraseSearch.phraseOccurrences(
          Tables.documents(s, d), "doc_id", "text",
          Seq("slow", "hash", "batch"))
        .orderBy(col("doc_id"), col("start_pos"))),

    // Hybrid retrieval: top-50 lexical ∪ top-50 dense, fused by
    // reciprocal rank (k=60), top-10 by fused score. Ranks are assigned
    // AFTER the top-k cuts (windows sort ≤50 rows, not a corpus).
    "q_hybrid_rrf" -> ((s, d) =>
      // top-10 is a prefix of the shared fused top-20 (same ordering,
      // tighter cut) — served from the memoized candidate list
      fused20(s, d).orderBy(col("rrf").desc, col("doc_id")).limit(10)),

    // Rerank stage: the fused top-20 rescored by a fixed linear feature
    // model (renormalized BM25, dense cosine, query-term overlap, length
    // prior) — the deterministic stand-in for a cross-encoder, keeping
    // retrieve→fuse→rerank closed-form end-to-end. Bounded candidate
    // list ⇒ every join broadcasts the candidates.
    "q_rerank_linear" -> ((s, d) =>
      Rerank.linear(fused20(s, d),
        Tables.documents(s, d), Tables.embeddings(s, d),
        "doc_id", "text", "vec_id", "embedding",
        queryId = 0L, terms = terms, k = 10, w = rerankW,
        k1 = k1, b = b)),

    // Pseudo-relevance feedback (Bm25.prfTopK): top-10 feedback docs →
    // top-3 expansion terms by summed tf (query terms + the 181-word
    // stoplist excluded, ties by token) → re-score terms ∪ expansion
    // through the postings index. Both passes are pruned index probes;
    // the mirror recomputes the expansion AND the second pass with the
    // join-form quantized BM25 (dynamic term set — the static per-term
    // CTE can't know the expansion).
    "q_prf_topk" -> ((s, d) =>
      graft.operators.Bm25.prfTopK(s, postingsIndex(s, d), terms,
        stopwords = TokenOps.englishStopwords, k = 10,
        nFeedback = 10, nExpand = 3, k1 = k1, b = b)),

    // The SERVED form of q_prf_topk: identical semantics and output
    // (shared oracle), but the expansion leg reads only the feedback
    // docs' bucket partitions off the doc-keyed postings twin
    // (PartitionFilters plan-pinned in RetrievalSpec) instead of
    // scanning the term-bucketed postings.
    "q_prf_topk_srv" -> ((s, d) =>
      graft.operators.Bm25.prfTopKServed(s, postingsIndex(s, d), terms,
        stopwords = TokenOps.englishStopwords, k = 10,
        nFeedback = 10, nExpand = 3, k1 = k1, b = b)),

    // Served PRF THROUGH A REPLACE: the twin was built on the corrupted
    // corpus and maintained through replacePostings' staged commit
    // (touched doc buckets only, epoch handshake) — sharing the
    // never-corrupted PRF mirror makes twin-through-replace
    // bit-exactness an oracle fact. A re-crawl no longer costs a full
    // twin rebuild (r16 demand #6).
    "q_prf_repl_topk" -> ((s, d) =>
      graft.operators.Bm25.prfTopKServed(s, replacedIndex(s, d), terms,
        stopwords = TokenOps.englishStopwords, k = 10,
        nFeedback = 10, nExpand = 3, k1 = k1, b = b)),

    // Inverted-index build (one-time cost, explicit — the serving path's
    // amortized corpus work). Output is the full term-statistics table:
    // deterministic relational content, oracle-checked.
    "q_postings_build" -> ((s, d) =>
      graft.sources.PartitionedParquet.read(s, postingsIndex(s, d) + "/terms")
        .select(col("token"), col("df"), col("cf"))
        .orderBy(col("token"))),

    // The incrementally-maintained index's term table: base build on
    // even ids + appendPostings of the odd ids. Checked against the
    // SAME full-corpus oracle as q_postings_build — additive df/cf
    // merge must be indistinguishable from a from-scratch build.
    "q_postings_incremental" -> ((s, d) =>
      graft.sources.PartitionedParquet
        .read(s, incrementalIndex(s, d) + "/terms")
        .select(col("token"), col("df"), col("cf"))
        .orderBy(col("token"))),

    // BM25 top-10 served FROM the incrementally-built index — the probe
    // path over appended bucket partitions (each touched bucket has a
    // base + delta file), quantized-sum oracle as q_bm25_postings_topk.
    "q_bm25_incr_topk" -> ((s, d) =>
      Bm25.topKFromPostings(s, incrementalIndex(s, d), terms, k = 10,
        k1 = k1, b = b)),

    // BM25 top-10 served FROM the materialized index: partition-pruned
    // posting-list read, broadcast against the doclens scan, integer-
    // quantized partial sums (order-free ⇒ engine- and plan-stable).
    // Must agree with q_bm25_topk's one-shot scoring to ≤1.5e-9/term.
    "q_bm25_postings_topk" -> ((s, d) =>
      Bm25.topKFromPostings(s, postingsIndex(s, d), terms, k = 10,
        k1 = k1, b = b)),

    // Retrieval evaluation loop: recall@10 and MRR of the lexical,
    // fused, and reranked top-10 lists against a deterministic relevance
    // set (docs containing >= 2 of the 3 query terms — deliberately NOT
    // any single retriever's own criterion). The q_ivf_recall pattern
    // applied to the lexical stack: the eval itself is in-engine and
    // oracle-checked, so a retrieval regression breaks a hash, not a
    // dashboard. Ranks are windows over <= 10-row lists; the relevance
    // join is a semi-join against the list union.
    "q_retrieval_eval" -> ((s, d) => {
      val (lists, rel, nRel) = evalLists(s, d)
      lists
        .join(rel, Seq("doc_id"), "left_semi")
        .groupBy(col("method"))
        .agg(count(lit(1)).as("hits"),
          round(max(lit(1.0) / col("rank").cast("double")), 6).as("mrr"))
        .crossJoin(broadcast(nRel))
        .select(col("method"), col("n_relevant"), col("hits"),
          round(col("hits").cast("double") / col("n_relevant").cast("double"),
            6).as("recall_at_10"),
          col("mrr"))
        .orderBy(col("method"))
    }),

    // nDCG@10 of the same three retrievers — the graded-position metric
    // recall/MRR can't see (a hit at rank 1 and a hit at rank 10 score
    // the same recall; nDCG discounts by log2(rank+1)). Binary gains on
    // the 1e-9 grid: per-hit gain_nano = round(1e9/log2(rank+1)) sums
    // exactly; the ideal DCG folds the same grid over ranks
    // 1..min(10, n_relevant); ONE double division at the close.
    "q_retrieval_ndcg" -> ((s, d) => {
      val (lists, rel, nRel) = evalLists(s, d)
      val gainNano = round(lit(1e9) /
        log2(col("rank").cast("double") + lit(1.0))).cast("long")
      val idcg = nRel.select(col("n_relevant"),
        aggregate(sequence(lit(1L), least(lit(10L), col("n_relevant"))),
          lit(0L), (acc, i) => acc + round(lit(1e9) /
            log2(i.cast("double") + lit(1.0))).cast("long"))
          .as("idcg_nano"))
      lists
        .join(rel, Seq("doc_id"), "left_semi")
        .groupBy(col("method"))
        .agg(sum(gainNano).as("dcg_nano"))
        .crossJoin(broadcast(idcg))
        .select(col("method"), col("n_relevant"), col("dcg_nano"),
          col("idcg_nano"),
          round(col("dcg_nano").cast("double") /
            col("idcg_nano").cast("double"), 6).as("ndcg_at_10"))
        .orderBy(col("method"))
    }),

    // MMR diversity selection (Rerank.mmr): the fused top-20 de-redunded
    // to 8 slots — each greedy round maximizes λ·rel − (1−λ)·max-sim to
    // the already-picked set (λ=0.7). The k-round greedy is inherently
    // sequential (bounded driver loop over ≤20 candidates; pairwise
    // cosines are the only cluster work); the mirror UNROLLS the same
    // rounds as a generated CTE chain, so every pick and tie-break is
    // oracle-checked.
    "q_mmr_select" -> ((s, d) =>
      Rerank.mmr(
          fused20(s, d).select(col("doc_id"), col("rrf").as("rel")),
          Tables.embeddings(s, d), "doc_id", "vec_id", "embedding",
          "rel", k = MmrK, lambda = MmrLambda)
        .orderBy(col("pick_rank"))),

    // The deleted index's term table: add-then-delete must be
    // indistinguishable from never-added — SAME full-corpus oracle as
    // q_postings_build (deletion re-subtracts df/cf exactly; delta-only
    // terms drop out at df = 0).
    "q_postings_deleted" -> ((s, d) =>
      graft.sources.PartitionedParquet
        .read(s, deletedIndex(s, d) + "/terms")
        .select(col("token"), col("df"), col("cf"))
        .orderBy(col("token"))),

    // BM25 top-10 served from the deleted index — the anti-join-rewritten
    // bucket partitions and subtracted stats must score byte-identically
    // to the never-added build (same quantized-sum mirror).
    "q_bm25_del_topk" -> ((s, d) =>
      Bm25.topKFromPostings(s, deletedIndex(s, d), terms, k = 10,
        k1 = k1, b = b)),

    // The replaced index's term table: corrupted/missing docs upserted by
    // ONE replacePostings call — checked against the SAME full-corpus
    // oracle as q_postings_build (the replace must leave no trace of the
    // corrupted text and fill in the missing docs exactly).
    "q_postings_replaced" -> ((s, d) =>
      graft.sources.PartitionedParquet
        .read(s, replacedIndex(s, d) + "/terms")
        .select(col("token"), col("df"), col("cf"))
        .orderBy(col("token"))),

    // BM25 top-10 served from the replaced index (same quantized-sum
    // full-corpus mirror).
    "q_bm25_repl_topk" -> ((s, d) =>
      Bm25.topKFromPostings(s, replacedIndex(s, d), terms, k = 10,
        k1 = k1, b = b))
  )

  // ---- DuckDB mirrors ------------------------------------------------
  // The SQL is generated from the same `terms`/`k1`/`b` constants and
  // written in the same association order as the Column expressions, so
  // both engines do the identical IEEE arithmetic before round(…, 6).
  // (Scala Double.toString round-trips, so interpolated constants parse
  // back to bit-identical doubles.)

  private val wsSql = TokenOps.WsRun

  private val statsSql: String =
    "SELECT count(*) AS n_docs, sum(len(t)) AS total_len, " +
      terms.zipWithIndex.map { case (t, i) =>
        s"sum(CASE WHEN list_contains(t, '$t') THEN 1 ELSE 0 END) AS df_$i"
      }.mkString(", ") + " FROM toks"

  private def partialSql(t: String, i: Int): String = {
    val tf = s"CAST(len(list_filter(t, x -> x = '$t')) AS DOUBLE)"
    val df = s"CAST(df_$i AS DOUBLE)"
    val idf = s"ln(1.0 + (CAST(n_docs AS DOUBLE) - $df + 0.5) / ($df + 0.5))"
    val dl = "CAST(len(t) AS DOUBLE)"
    val avgdl = "(CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    s"CASE WHEN $tf > 0.0 THEN $idf * ($tf * ${k1 + 1.0}) / " +
      s"($tf + $k1 * (${1.0 - b} + $b * $dl / $avgdl)) ELSE 0.0 END"
  }

  private val ctePrefix: String =
    s"""WITH toks AS (SELECT doc_id,
       |  regexp_split_to_array(lower(text), '$wsSql') AS t FROM documents),
       |stats AS ($statsSql)""".stripMargin

  private val scoredSql: String =
    s"""$ctePrefix,
       |scored AS (SELECT doc_id, round(
       |  ${terms.zipWithIndex.map((partialSql _).tupled).mkString(" + ")},
       |  6) AS bm25 FROM toks CROSS JOIN stats)""".stripMargin

  // The postings probe's quantized twin: per-term partials rounded onto
  // an exact 1e-9 integer grid before the (order-free) sum — the same
  // arithmetic scoreFromPostings does, so the hash compare is immune to
  // double-summation order.
  private def partialQuantSql(t: String, i: Int): String =
    s"CAST(round((${partialSql(t, i)}) * 1000000000.0) AS BIGINT)"

  /** The full retrieve→fuse CTE chain (toks/stats/scored + lex + dense
    * cosine + RRF fusion) — the hybrid query reads `fused` directly; the
    * rerank mirror also reuses `toks`, `scored`, and `cos` for its
    * features. */
  private val fusedCtes: String =
    s"""$scoredSql,
       |lex AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
       |  FROM (SELECT doc_id, bm25 FROM scored WHERE bm25 > 0
       |        ORDER BY bm25 DESC, doc_id LIMIT $topN)),
       |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id <> 0),
       |cos AS (SELECT vec_id, round(list_dot_product(v, qv)
       |    / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos
       |  FROM e CROSS JOIN q),
       |dense AS (SELECT vec_id AS doc_id, row_number() OVER (ORDER BY cos DESC, vec_id) AS dense_rank
       |  FROM (SELECT vec_id, cos FROM cos ORDER BY cos DESC, vec_id LIMIT $topN)),
       |fused AS (SELECT COALESCE(l.doc_id, de.doc_id) AS doc_id,
       |    l.lex_rank, de.dense_rank,
       |    round(COALESCE(1.0::DOUBLE / (60 + l.lex_rank), 0.0)
       |        + COALESCE(1.0::DOUBLE / (60 + de.dense_rank), 0.0), 6) AS rrf
       |  FROM lex l FULL OUTER JOIN dense de ON l.doc_id = de.doc_id)""".stripMargin

  /** The rerank pipeline through scoring as CTEs (`rr` holds every
    * candidate's 6dp rerank score) — shared by the rerank query's mirror
    * and the retrieval-eval mirror. Feature SQL stays in the same
    * textual order as Rerank.linear's Column expressions (weights
    * interpolated from the SAME Weights instance). */
  private val rerankCtes: String =
    s"""$fusedCtes,
       |cand AS (SELECT doc_id FROM fused ORDER BY rrf DESC, doc_id LIMIT 20),
       |feat AS (SELECT c.doc_id,
       |    COALESCE(s2.bm25, 0.0) AS bm25,
       |    COALESCE(co.cos, 0.0) AS cos,
       |    CAST(${terms.map(t =>
             s"(CASE WHEN list_contains(t, '$t') THEN 1 ELSE 0 END)")
            .mkString(" + ")} AS DOUBLE) / ${terms.size.toDouble} AS overlap,
       |    1.0 / (1.0 + ln(1.0 + CAST(len(t) AS DOUBLE))) AS len_prior
       |  FROM cand c
       |  JOIN toks tk ON c.doc_id = tk.doc_id
       |  LEFT JOIN (SELECT doc_id, bm25 FROM scored WHERE bm25 > 0) s2
       |    ON c.doc_id = s2.doc_id
       |  LEFT JOIN cos co ON c.doc_id = co.vec_id),
       |mx AS (SELECT max(bm25) AS mb FROM feat),
       |rr AS (SELECT doc_id, round(
       |    ${rerankW.bm25} * (CASE WHEN mb > 0 THEN bm25 / mb ELSE 0.0 END)
       |  + ${rerankW.cos} * cos
       |  + ${rerankW.overlap} * overlap
       |  + ${rerankW.len} * len_prior, 6) AS rerank
       |  FROM feat CROSS JOIN mx)""".stripMargin

  /** The PRF mirror (shared by q_prf_topk and its served twin): first
    * pass = the static quantized CTE; expansion + second pass in JOIN
    * form over the dynamic term set, identical double chain, 1e-9
    * per-partial quantization, order-free integer sum. */
  private lazy val prfMirrorSql: String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val stopList = TokenOps.sqlList(TokenOps.englishStopwords)
    val partial =
      s"""ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
         |      / (CAST(df AS DOUBLE) + 0.5))
         |    * (CAST(tf AS DOUBLE) * ${k1 + 1.0})
         |    / (CAST(tf AS DOUBLE) + $k1 * (${1.0 - b}
         |      + $b * CAST(dl AS DOUBLE)
         |        / (CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE))))""".stripMargin
    s"""$scoredQuantSql,
       |fb AS (SELECT doc_id FROM scored WHERE bm25 > 0
       |       ORDER BY bm25 DESC, doc_id LIMIT 10),
       |tfx AS (SELECT doc_id, unnest(t) AS token FROM toks),
       |tft AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
       |        FROM tfx GROUP BY doc_id, token),
       |expn AS (SELECT token FROM tft JOIN fb USING (doc_id)
       |        WHERE token NOT IN ($termList)
       |          AND token NOT IN ($stopList)
       |        GROUP BY token ORDER BY sum(tf) DESC, token LIMIT 3),
       |qt AS (SELECT unnest([$termList]) AS token
       |       UNION ALL SELECT token FROM expn),
       |dft AS (SELECT token, CAST(count(*) AS BIGINT) AS df
       |        FROM tft GROUP BY token),
       |dls AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
       |part AS (SELECT tft.doc_id,
       |    CAST(round(($partial) * 1000000000.0) AS BIGINT) AS pq
       |  FROM tft JOIN qt USING (token) JOIN dft USING (token)
       |  JOIN dls ON tft.doc_id = dls.doc_id CROSS JOIN stats),
       |scored2 AS (SELECT doc_id,
       |    round(CAST(sum(pq) AS DOUBLE) / 1000000000.0, 6) AS bm25
       |  FROM part GROUP BY doc_id)
       |SELECT doc_id, bm25 FROM scored2 WHERE bm25 > 0
       |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin
  }

  private val scoredQuantSql: String =
    s"""$ctePrefix,
       |scored AS (SELECT doc_id, round(CAST(
       |  ${terms.zipWithIndex.map((partialQuantSql _).tupled).mkString(" + ")}
       |  AS DOUBLE) / 1000000000.0, 6) AS bm25 FROM toks CROSS JOIN stats)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_bm25_topk" ->
      s"""$scoredSql
         |SELECT doc_id, bm25 FROM scored WHERE bm25 > 0
         |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin,

    "q_phrase_search" ->
      s"""WITH toks AS (SELECT doc_id,
         |  regexp_split_to_array(lower(text), '$wsSql') AS t
         |  FROM documents)
         |SELECT doc_id, CAST(i AS BIGINT) AS start_pos
         |FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
         |WHERE t[i] = 'slow' AND t[i+1] = 'hash' AND t[i+2] = 'batch'
         |ORDER BY doc_id, start_pos""".stripMargin,

    "q_postings_build" ->
      s"""WITH toks AS (SELECT doc_id,
         |  unnest(regexp_split_to_array(lower(text), '$wsSql')) AS token
         |  FROM documents),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
         |       GROUP BY doc_id, token)
         |SELECT token, CAST(count(*) AS BIGINT) AS df,
         |       CAST(sum(tf) AS BIGINT) AS cf
         |FROM tf GROUP BY token ORDER BY token""".stripMargin,

    "q_bm25_postings_topk" ->
      s"""$scoredQuantSql
         |SELECT doc_id, bm25 FROM scored WHERE bm25 > 0
         |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin,

    // incremental build vs the same full-corpus mirrors: the append
    // path must be indistinguishable from a from-scratch build
    "q_postings_incremental" ->
      s"""WITH toks AS (SELECT doc_id,
         |  unnest(regexp_split_to_array(lower(text), '$wsSql')) AS token
         |  FROM documents),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
         |       GROUP BY doc_id, token)
         |SELECT token, CAST(count(*) AS BIGINT) AS df,
         |       CAST(sum(tf) AS BIGINT) AS cf
         |FROM tf GROUP BY token ORDER BY token""".stripMargin,

    "q_bm25_incr_topk" ->
      s"""$scoredQuantSql
         |SELECT doc_id, bm25 FROM scored WHERE bm25 > 0
         |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin,

    // add-then-delete round trip vs the never-added full-corpus mirrors:
    // the deletion path must leave no trace
    "q_postings_deleted" ->
      s"""WITH toks AS (SELECT doc_id,
         |  unnest(regexp_split_to_array(lower(text), '$wsSql')) AS token
         |  FROM documents),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
         |       GROUP BY doc_id, token)
         |SELECT token, CAST(count(*) AS BIGINT) AS df,
         |       CAST(sum(tf) AS BIGINT) AS cf
         |FROM tf GROUP BY token ORDER BY token""".stripMargin,

    "q_bm25_del_topk" ->
      s"""$scoredQuantSql
         |SELECT doc_id, bm25 FROM scored WHERE bm25 > 0
         |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin,

    // replace (re-crawl upsert) round trip vs the never-corrupted
    // full-corpus mirrors: one replacePostings call must erase the
    // corrupted text and insert the missing docs exactly
    "q_postings_replaced" ->
      s"""WITH toks AS (SELECT doc_id,
         |  unnest(regexp_split_to_array(lower(text), '$wsSql')) AS token
         |  FROM documents),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
         |       GROUP BY doc_id, token)
         |SELECT token, CAST(count(*) AS BIGINT) AS df,
         |       CAST(sum(tf) AS BIGINT) AS cf
         |FROM tf GROUP BY token ORDER BY token""".stripMargin,

    "q_bm25_repl_topk" ->
      s"""$scoredQuantSql
         |SELECT doc_id, bm25 FROM scored WHERE bm25 > 0
         |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin,

    "q_hybrid_rrf" ->
      s"""$fusedCtes
         |SELECT doc_id, lex_rank, dense_rank, rrf FROM fused
         |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,

    // Rerank mirror: fused top-20 candidates, features in the same
    // textual order as Rerank.linear's Column expressions (weights
    // interpolated from the SAME Weights instance).
    "q_rerank_linear" ->
      s"""$rerankCtes
         |SELECT doc_id, rerank FROM rr
         |ORDER BY rerank DESC, doc_id LIMIT 10""".stripMargin,

    // MMR mirror: the greedy rounds UNROLLED as a CTE chain (the
    // k-means/BPE discipline) — identical λ·rel − (1−λ)·maxsim double
    // chain (1−λ interpolated as the COMPUTED Scala double, 0.7 → 1−λ =
    // 0.30000000000000004), 6dp pairwise cosines, ties by doc_id
    "q_mmr_select" -> {
      val l = MmrLambda
      val om = 1.0 - MmrLambda
      val rounds = (2 to MmrK).map { i =>
        s"""sc$i AS (SELECT c.doc_id,
           |    $l * c.rel - $om * coalesce(mx.m, 0.0) AS score
           |  FROM cand c
           |  LEFT JOIN (SELECT ps.a AS doc_id, max(ps.c) AS m
           |             FROM ps JOIN sel${i - 1}all s ON ps.b = s.doc_id
           |             GROUP BY ps.a) mx
           |    ON c.doc_id = mx.doc_id
           |  WHERE c.doc_id NOT IN (SELECT doc_id FROM sel${i - 1}all)),
           |pick$i AS (SELECT doc_id, $i AS pick_rank,
           |    round(score, 6) AS mmr_score
           |  FROM sc$i ORDER BY score DESC, doc_id LIMIT 1),
           |sel${i}all AS (SELECT doc_id FROM sel${i - 1}all
           |  UNION ALL SELECT doc_id FROM pick$i)""".stripMargin
      }.mkString(",\n")
      val picks = (2 to MmrK).map(i => s"SELECT * FROM pick$i")
        .mkString("\nUNION ALL ")
      s"""$fusedCtes,
         |cand AS MATERIALIZED (SELECT doc_id, rrf AS rel FROM fused
         |         ORDER BY rrf DESC, doc_id LIMIT 20),
         |cv AS MATERIALIZED (SELECT c.doc_id, e.embedding::DOUBLE[] AS v
         |       FROM cand c JOIN embeddings e ON c.doc_id = e.vec_id),
         |pc AS MATERIALIZED (SELECT x.doc_id AS a, y.doc_id AS b,
         |         round(list_dot_product(x.v, y.v)
         |           / (sqrt(list_dot_product(x.v, x.v))
         |             * sqrt(list_dot_product(y.v, y.v))), 6) AS c
         |       FROM cv x JOIN cv y ON x.doc_id < y.doc_id),
         |ps AS MATERIALIZED (SELECT a, b, c FROM pc
         |       UNION ALL SELECT b AS a, a AS b, c FROM pc),
         |pick1 AS (SELECT doc_id, 1 AS pick_rank,
         |    round($l * rel - $om * 0.0, 6) AS mmr_score
         |  FROM cand ORDER BY $l * rel - $om * 0.0 DESC, doc_id LIMIT 1),
         |sel1all AS (SELECT doc_id FROM pick1),
         |$rounds
         |SELECT doc_id, CAST(pick_rank AS BIGINT) AS pick_rank, mmr_score
         |FROM (SELECT * FROM pick1
         |UNION ALL $picks)
         |ORDER BY pick_rank""".stripMargin
    },

    // retrieval eval mirror: the same three ranked lists the engine
    // builds (lexical / fused / reranked top-10), scored against the
    // >=2-query-terms relevance set
    "q_retrieval_eval" ->
      s"""$rerankCtes,
         |rel AS (SELECT doc_id FROM toks
         |  WHERE (${terms.map(t =>
               s"(CASE WHEN list_contains(t, '$t') THEN 1 ELSE 0 END)")
              .mkString(" + ")}) >= 2),
         |nrel AS (SELECT CAST(count(*) AS BIGINT) AS n_relevant FROM rel),
         |lexlist AS (SELECT doc_id,
         |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
         |  FROM (SELECT doc_id, bm25 FROM scored WHERE bm25 > 0
         |        ORDER BY bm25 DESC, doc_id LIMIT 10)),
         |fusedlist AS (SELECT doc_id,
         |    row_number() OVER (ORDER BY rrf DESC, doc_id) AS rank
         |  FROM (SELECT doc_id, rrf FROM fused
         |        ORDER BY rrf DESC, doc_id LIMIT 10)),
         |rrlist AS (SELECT doc_id,
         |    row_number() OVER (ORDER BY rerank DESC, doc_id) AS rank
         |  FROM (SELECT doc_id, rerank FROM rr
         |        ORDER BY rerank DESC, doc_id LIMIT 10)),
         |lists AS (SELECT 'bm25' AS method, doc_id, rank FROM lexlist
         |  UNION ALL SELECT 'rrf', doc_id, rank FROM fusedlist
         |  UNION ALL SELECT 'rerank', doc_id, rank FROM rrlist),
         |hit AS (SELECT method, rank FROM lists
         |        WHERE doc_id IN (SELECT doc_id FROM rel))
         |SELECT method, n_relevant, CAST(count(*) AS BIGINT) AS hits,
         |  round(CAST(count(*) AS DOUBLE) / CAST(n_relevant AS DOUBLE), 6)
         |    AS recall_at_10,
         |  round(max(1.0 / CAST(rank AS DOUBLE)), 6) AS mrr
         |FROM hit CROSS JOIN nrel
         |GROUP BY method, n_relevant ORDER BY method""".stripMargin,

    // PRF mirror: first pass = the static quantized CTE; expansion and
    // the second pass recomputed in JOIN form (tf/df/dl tables against
    // the dynamic term set) with the IDENTICAL per-term double chain and
    // the same 1e-9 per-partial quantization, so the order-free integer
    // sum matches scoreFromPostings bit-for-bit. The served form reads
    // the doc-keyed layout but computes the SAME function — one mirror,
    // two serving paths (the q_semdedup_incr_srv discipline).
    "q_prf_topk" -> prfMirrorSql,
    "q_prf_topk_srv" -> prfMirrorSql,
    // LITERALLY the same mirror: the replaced index + maintained twin
    // must serve the never-corrupted expansion
    "q_prf_repl_topk" -> prfMirrorSql,

    // nDCG mirror: the same three lists, per-hit gains and the ideal
    // prefix both on the 1e-9 round(1e9/log2(rank+1)) grid, one close
    "q_retrieval_ndcg" ->
      s"""$rerankCtes,
         |rel AS (SELECT doc_id FROM toks
         |  WHERE (${terms.map(t =>
               s"(CASE WHEN list_contains(t, '$t') THEN 1 ELSE 0 END)")
              .mkString(" + ")}) >= 2),
         |nrel AS (SELECT CAST(count(*) AS BIGINT) AS n_relevant FROM rel),
         |lexlist AS (SELECT doc_id,
         |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
         |  FROM (SELECT doc_id, bm25 FROM scored WHERE bm25 > 0
         |        ORDER BY bm25 DESC, doc_id LIMIT 10)),
         |fusedlist AS (SELECT doc_id,
         |    row_number() OVER (ORDER BY rrf DESC, doc_id) AS rank
         |  FROM (SELECT doc_id, rrf FROM fused
         |        ORDER BY rrf DESC, doc_id LIMIT 10)),
         |rrlist AS (SELECT doc_id,
         |    row_number() OVER (ORDER BY rerank DESC, doc_id) AS rank
         |  FROM (SELECT doc_id, rerank FROM rr
         |        ORDER BY rerank DESC, doc_id LIMIT 10)),
         |lists AS (SELECT 'bm25' AS method, doc_id, rank FROM lexlist
         |  UNION ALL SELECT 'rrf', doc_id, rank FROM fusedlist
         |  UNION ALL SELECT 'rerank', doc_id, rank FROM rrlist),
         |dcg AS (SELECT method,
         |    CAST(sum(CAST(round(1e9 / log2(CAST(rank AS DOUBLE) + 1.0))
         |      AS BIGINT)) AS BIGINT) AS dcg_nano
         |  FROM lists WHERE doc_id IN (SELECT doc_id FROM rel)
         |  GROUP BY method),
         |idcg AS (SELECT n_relevant,
         |    CAST(sum(CAST(round(1e9 / log2(CAST(i AS DOUBLE) + 1.0))
         |      AS BIGINT)) AS BIGINT) AS idcg_nano
         |  FROM nrel, unnest(generate_series(1, least(10, n_relevant)))
         |    AS u(i)
         |  GROUP BY n_relevant)
         |SELECT method, n_relevant, dcg_nano, idcg_nano,
         |  round(CAST(dcg_nano AS DOUBLE) / CAST(idcg_nano AS DOUBLE), 6)
         |    AS ndcg_at_10
         |FROM dcg CROSS JOIN idcg ORDER BY method""".stripMargin
  )
}
