package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PolyHashF

/** Data Selection via Importance Resampling (DSIR — Xie, Santurkar, Ma,
  * Liang, NeurIPS 2023): pick raw-corpus documents that look like a
  * target domain by importance weighting in a HASHED n-gram feature
  * space. The reference pipeline has no data-selection stage at all
  * (`/root/reference/preprocessing.py` filters rows, it never scores
  * them against a domain); this is the standard pretraining-corpus
  * curation operator built on the bag-of-ngrams model the paper shows
  * is enough.
  *
  * Model: features are unigram + bigram counts hashed into B buckets
  * (the hashing trick — the vocabulary NEVER materializes, which is the
  * whole reason this scales where [[UnigramLM]]'s vocab join is the
  * bottleneck shape). Fit add-one-smoothed bucket distributions
  * p (target domain) and q (raw corpus); a document's log importance
  * weight is
  *
  *   log w(x) = Σ_b c_b(x) · (log p_b − log q_b)
  *
  * Selection is either deterministic top-k by weight, or Gumbel top-k —
  * the exact equivalent of sampling k documents without replacement with
  * probability ∝ w(x) (Vieira 2014): key = log w + Gumbel(0,1), take the
  * k largest. Our Gumbel noise derives from [[graft.functions.PolyHash]]
  * of the doc id under a seed tag, so sampling is deterministic AND
  * oracle-mirrorable — unlike every xxhash-based sampler in this repo,
  * the DuckDB oracle recomputes the noise itself.
  *
  * Plan shape at 100 TB (the reason DSIR beats classifier- or
  * perplexity-based selection at scale):
  *   1. gram → bucket is ROW-LOCAL (hash mod B): no vocabulary shuffle,
  *      no dictionary join — the only corpus-wide state is B counters;
  *   2. one explode pass builds BOTH bucket-count tables (raw + target)
  *      in a single B-row aggregate (map-side combined; target counts
  *      ride along as a conditional count);
  *   3. scoring re-explodes and joins the B-row delta table BROADCAST —
  *      per-doc partial aggregation happens map-side on (doc, bucket)
  *      before the weight sum. Two corpus passes total; the one
  *      corpus-shaped shuffle carries (doc, bucket, count) integer
  *      triples — ≤ one row per distinct bucket per document, 24 bytes
  *      each, an order of magnitude thinner than the text it scores.
  *
  * Determinism: per-bucket log-ratios quantize onto the 1e-9 integer
  * grid BEFORE any summation (the [[UnigramLM]] nano-grid discipline),
  * so weights are bit-stable across engines and partitionings.
  */
object Dsir {

  /** (id, is_target, bucket) — one row per unigram AND bigram instance,
    * bucketed by poly_hash mod `b`; the target-domain flag rides along
    * from the document row so fitting needs NO join. Bigram gram string
    * is "w1 w2" (tokens cannot contain whitespace under the shared
    * tokenizer, so the join is unambiguous). Row-local: the bigram pairs
    * zip the token array with its own shift, no positional self-join. */
  def hashedGrams(docs: DataFrame, idCol: String, textCol: String,
      target: Column, b: Int): DataFrame = {
    val toks = TokenOps.tokenize(col(textCol))
    docs.select(col(idCol), target.as("is_target"),
        explode(concat(
          toks,
          zip_with(
            slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
            slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
            (w1, w2) => concat(w1, lit(" "), w2)))).as("gram"))
      .select(col(idCol), col("is_target"),
        pmod(PolyHashF.poly_hash(col("gram")), lit(b.toLong)).as("bucket"))
  }

  /** B-row delta table: (bucket, dq) where dq = the 1e-9-quantized
    * log p_b − log q_b under add-one smoothing. Both distributions fit
    * in ONE pass (target counts as a conditional count inside the same
    * aggregate). Buckets no gram ever hits are absent — they cannot be
    * referenced by any document either, so the scoring join never
    * misses. */
  def bucketDeltas(grams: DataFrame, b: Int): DataFrame = {
    val counts = grams.groupBy(col("bucket"))
      .agg(count(lit(1)).as("r"),
        count(when(col("is_target"), 1)).as("t"))
      .localCheckpoint()
    val totals = counts.agg(sum(col("r")).as("rn"), sum(col("t")).as("tn"))
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"),
        round((log((col("t") + lit(1L)).cast("double") /
                   (col("tn") + lit(b.toLong)).cast("double")) -
               log((col("r") + lit(1L)).cast("double") /
                   (col("rn") + lit(b.toLong)).cast("double")))
          * lit(1e9)).cast("long").as("dq"))
  }

  /** The scoring pass alone: per-document weight sum of `grams` against
    * an already-fitted B-row `deltas` table — one corpus scan, one
    * broadcast join, ONE doc-keyed shuffle. Split out from [[weights]]
    * so a caller holding a memoized fit (the kmeans_model discipline:
    * fit once per session, score per query) times exactly this lineage.
    *
    * Gram instances join the broadcast delta table DIRECTLY (map-side)
    * and aggregate once by document: the previous (doc, bucket)
    * pre-count bought almost nothing (unigram+bigram buckets are
    * near-distinct per document) while paying a corpus-keyed Exchange
    * plus a second aggregation pass; map-side partial aggregation on
    * the doc key compacts the shuffle to one row per (partition, doc)
    * anyway (guide §2.3/§2.4). Σ dq over instances ≡ Σ c·dq over
    * bucket groups — exact long sums, order-free, bit-identical. */
  def score(grams: DataFrame, idCol: String, deltas: DataFrame): DataFrame =
    grams.join(broadcast(deltas), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        round(sum(col("dq")).cast("double") / lit(1e9), 6)
          .as("logw"))

  /** (id, n_grams, logw): per-document log importance weight, rounded to
    * 6dp. `target` is a predicate over `docs` columns selecting the
    * target-domain rows (fit set); every document is scored. */
  def weights(docs: DataFrame, idCol: String, textCol: String,
      target: Column, b: Int = 4096): DataFrame = {
    // deliberately NOT checkpointed: grams are corpus-sized, and the
    // two consumers (fit aggregate, scoring rollup) each re-derive them
    // from the scan row-locally — two cheap passes beat materializing
    // an exploded corpus to executor disk. The B-row fit output IS
    // checkpointed (inside bucketDeltas), so the fit runs once.
    val grams = hashedGrams(docs, idCol, textCol, target, b)
    score(grams, idCol, bucketDeltas(grams, b))
  }

  /** Deterministic selection: top `k` documents by (logw desc, id) —
    * TakeOrderedAndProject, no global sort materializes. */
  def selectTopK(w: DataFrame, idCol: String, k: Int): DataFrame =
    w.orderBy(col("logw").desc, col(idCol)).limit(k)

  /** Gumbel top-k importance RESAMPLING: key = logw + Gumbel(0,1), take
    * the k largest — exactly sampling k docs without replacement with
    * prob ∝ exp(logw). The Gumbel is −ln(−ln(u)) with
    * u = (poly_hash("g<seed>:" || id) + 1) / (P + 1) ∈ (0, 1), so the
    * draw is deterministic per (seed, id) and the oracle recomputes it.
    * The noise quantizes onto the same 1e-9 grid as the weight before
    * the sum, keeping the sort key integer-exact. */
  def gumbelTopK(w: DataFrame, idCol: String, k: Int,
      seed: Int): DataFrame = {
    val p = graft.functions.PolyHashKernel.Mod
    val u = (PolyHashF.poly_hash(
        concat(lit(s"g$seed:"), col(idCol).cast("string"))) + lit(1L))
      .cast("double") / lit((p + 1L).toDouble)
    val gq = round(-log(-log(u)) * lit(1e9)).cast("long")
    w.withColumn("key_nano",
        round(col("logw") * lit(1e9)).cast("long") + gq)
      .orderBy(col("key_nano").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("logw"),
        round(col("key_nano").cast("double") / lit(1e9), 6).as("gumbel_key"))
  }
}
