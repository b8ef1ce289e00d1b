package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Unigram language-model scoring: fit add-one-smoothed token
  * probabilities on the corpus itself, then score every document by its
  * mean negative log-likelihood — the classic cheap "LM loss" quality
  * signal for training-data curation (high NLL ⇒ the document is unlike
  * the corpus: boilerplate, noise, wrong language; low NLL ⇒ generic,
  * repetitive text). Complements the rule-based quality/Gopher signals in
  * [[TokenOps]] with a corpus-adaptive one.
  *
  * Model: p(t) = (c_t + 1) / (N + V) over whitespace tokens (the same
  * [[TokenOps.tokenize]] convention every token oracle shares), where
  * c_t = corpus count, N = Σ c_t, V = |vocab|.
  *
  * Plan shape at 100 TB:
  *   1. one explode → `groupBy(token)` builds the count table —
  *      vocabulary-sized output (sublinear in corpus), partial-aggregated
  *      map-side;
  *   2. the 1-row (N, V) frame derives from the counts, broadcast back;
  *   3. scoring re-explodes and equi-joins tokens→counts (the one keyed
  *      shuffle; a bounded vocab could broadcast instead, but vocabulary
  *      at web scale is not broadcast-safe by default), then per-doc
  *      aggregation.
  *
  * Determinism: each token's −ln p quantizes onto a 1e-9 integer grid
  * BEFORE the per-document sum (the money-sum discipline: double
  * summation order varies with the plan; integer sums don't), so the
  * score is bit-stable across engines and partitionings and the query is
  * oracle-checkable.
  */
object UnigramLM {

  /** (token, c) corpus counts under the shared tokenizer. */
  def tokenCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TokenOps.tokenize(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))

  /** Per-token −ln p(t) on the 1e-9 grid, as a Column over (c, n, v). */
  private def nllQuantized(c: Column, n: Column, v: Column): Column =
    round(-log((c + lit(1L)).cast("double") / (n + v).cast("double"))
      * lit(1e9)).cast("long")

  /** (id, n_tokens, nll): mean per-token NLL under an INTERPOLATED
    * bigram model — p(t|prev) = λ·p_bi + (1−λ)·p_uni with MLE bigram
    * probabilities (c_{prev,t} / Σ_t c_{prev,t}) backing off to the
    * add-one unigram; a document's first token scores unigram-only
    * (Jelinek-Mercer interpolation, the textbook smoothing the unigram
    * model can't express: "the car" is likelier than "car the").
    *
    * The (prev, token) pairs are built ROW-LOCAL (zip the token array
    * with its own shift — no positional self-join), so scoring adds two
    * vocabulary-sized equi-joins (bigram + history counts) to the
    * unigram plan, nothing corpus-shaped. Same nano-grid determinism
    * discipline as [[nll]]. */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String,
      lam: Double = 0.5): DataFrame = {
    // ONE (prev, token)-keyed score TABLE joined once, instead of
    // re-shuffling the corpus-sized instance stream by token, then by
    // (prev, token), then by prev (three wide shuffles → one): every
    // count table derives from the single allCounts type table (the
    // prev-null rows carry the unigram events, so counts = its token
    // rollup), the per-type −ln p quantizes in the type table, and the
    // instances join it once. Same nano-grid integers, same result.
    val (withPrev, allCounts, counts, stats) = bigramTables(docs, idCol, textCol)
    val bigramCounts = allCounts.filter(col("prev").isNotNull)
      .select(col("prev"), col("token"), col("cnt").as("cb"))
    val histCounts = bigramCounts.groupBy(col("prev"))
      .agg(sum(col("cb")).as("ch"))
    val pu = (col("c") + lit(1L)).cast("double") /
      (col("n") + col("v")).cast("double")
    val pb = col("cb").cast("double") / col("ch").cast("double")
    val p = when(col("prev").isNull, pu)
      .otherwise(lit(lam) * coalesce(pb, lit(0.0)) + lit(1.0 - lam) * pu)
    // type-sized score assembly (every join keys on type tables)
    val st = allCounts
      .join(counts, "token")
      .join(bigramCounts, Seq("prev", "token"), "left")
      .join(histCounts, Seq("prev"), "left")
      .crossJoin(broadcast(stats))
      .select(col("prev"), col("token"),
        round(-log(p) * lit(1e9)).cast("long").as("nq"))
    scoreByType(withPrev, st, idCol)
  }

  /** Shared bigram-model scaffolding: the row-local (token, prev)
    * instance stream, its (prev, token) TYPE table (checkpointed — the
    * one wordcount-shaped shuffle every derived count reads; prev-null
    * rows are the document-initial unigram events), the unigram counts
    * as its token rollup, and the 1-row (n, v) stats. */
  private def bigramTables(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val withPrev = docs.select(col(idCol),
        TokenOps.tokenize(col(textCol)).as("t"))
      .select(col(idCol), explode(zip_with(
        col("t"),
        concat(array(lit(null).cast("string")),
          slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0)))),
        (tok, prev) => struct(tok.as("token"), prev.as("prev"))))
        .as("bg"))
      .select(col(idCol), col("bg.token").as("token"),
        col("bg.prev").as("prev"))
    val allCounts = withPrev
      .groupBy(col("prev"), col("token")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val counts = allCounts.groupBy(col("token")).agg(sum(col("cnt")).as("c"))
    val stats = counts.agg(sum(col("c")).as("n"), count(lit(1)).as("v"))
    (withPrev, allCounts, counts, stats)
  }

  /** The shared scoring tail: instances equi-join the (prev, token)
    * score table ONCE (self-scoring totality: every instance is a
    * fitted type, so the join is lossless), then the per-doc order-free
    * integer rollup. */
  private def scoreByType(withPrev: DataFrame, st: DataFrame,
      idCol: String): DataFrame =
    withPrev
      .join(st, withPrev("prev") <=> st("prev") &&
        withPrev("token") === st("token"))
      .select(withPrev(idCol), col("nq"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("nq")).cast("double") / lit(1e9)
          / count(lit(1)).cast("double"), 6).as("nll"))

  /** (id, n_tokens, nll): mean per-token NLL under an INTERPOLATED
    * KNESER-NEY bigram model (Kneser & Ney 1995; Chen & Goodman 1998's
    * interpolated form), absolute discount D:
    *
    *   P(t|prev) = max(c(prev,t) − D, 0) / c(prev·)
    *             + (D · N1+(prev·) / c(prev·)) · N1+(·t) / N1+(··)
    *
    * where N1+(prev·) = distinct continuations observed after `prev`,
    * N1+(·t) = distinct histories observed before `t`, and N1+(··) =
    * total distinct bigram types. The continuation distribution is what
    * [[bigramNll]]'s Jelinek-Mercer mixture cannot express: a token
    * frequent only inside one collocation ("francisco") carries a LOW
    * continuation probability despite its high raw count, so novel
    * contexts don't inherit collocation-locked mass. A document's first
    * token scores the add-one unigram, as in [[bigramNll]].
    *
    * Self-scoring totality: every scored (prev, t) occurrence is itself
    * a fitted bigram event, so c(prev·) ≥ 1 and N1+(·t) ≥ 1 — no zero
    * probabilities, no special cases. Plan shape = [[bigramNll]] plus
    * ONE more vocabulary-sized aggregate (continuation-type counts);
    * the per-history type counts ride the existing history groupBy.
    * Same nano-grid determinism ⇒ oracle-checkable. */
  def kneserNeyNll(docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"absolute discount must sit in (0, 1), got $discount")
    // same one-score-table-join restructure as [[bigramNll]] (four wide
    // instance shuffles → one); every KN statistic is a rollup of the
    // single checkpointed type table
    val (withPrev, allCounts, counts, uniStats) =
      bigramTables(docs, idCol, textCol)
    val bigramCounts = allCounts.filter(col("prev").isNotNull)
      .select(col("prev"), col("token"), col("cnt").as("cb"))
    // c(prev·) and N1+(prev·) in one pass over the bigram-type table
    val histCounts = bigramCounts.groupBy(col("prev"))
      .agg(sum(col("cb")).as("ch"), count(lit(1)).as("n1h"))
    val contCounts = bigramCounts.groupBy(col("token"))
      .agg(count(lit(1)).as("n1c"))
    val knStats = bigramCounts.agg(count(lit(1)).as("n1tot"))
    val pu = (col("c") + lit(1L)).cast("double") /
      (col("n") + col("v")).cast("double")
    val pkn = greatest(col("cb").cast("double") - lit(discount), lit(0.0)) /
      col("ch").cast("double") +
      (lit(discount) * col("n1h").cast("double") / col("ch").cast("double")) *
        (col("n1c").cast("double") / col("n1tot").cast("double"))
    val p = when(col("prev").isNull, pu).otherwise(pkn)
    val st = allCounts
      .join(counts, "token")
      .join(bigramCounts, Seq("prev", "token"), "left")
      .join(histCounts, Seq("prev"), "left")
      .join(contCounts, Seq("token"), "left")
      .crossJoin(broadcast(uniStats))
      .crossJoin(broadcast(knStats))
      .select(col("prev"), col("token"),
        round(-log(p) * lit(1e9)).cast("long").as("nq"))
    scoreByType(withPrev, st, idCol)
  }

  /** Per-group token-distribution divergence from the corpus: for each
    * value of `groupCol` (a source, a shard, a date slice), the
    * entropy, cross-entropy under the corpus-global add-one unigram
    * model, and KL(P_group ‖ Q_corpus) in nats — the corpus-mix drift
    * diagnostic (a source whose KL jumps is no longer writing like the
    * corpus: template spam, a scraper gone wrong, an injection).
    *
    * EXACT on the observed support, no dense grid: p is the group's
    * UNSMOOTHED MLE, so every p·ln(·) term vanishes at p = 0 and the
    * sums range over observed (group, token) pairs only — while the
    * smoothed global q > 0 keeps each term finite. Wordcount-shaped:
    * one (group, token) reduce, a vocabulary-sized equi-join to the
    * global counts, and a group-sized rollup; each term quantizes onto
    * the 1e-9 grid before its order-free sum (the [[nll]] discipline). */
  def groupDivergence(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val gc = docs.select(col(groupCol).as("g"),
        explode(TokenOps.tokenize(col(textCol))).as("token"))
      .groupBy(col("g"), col("token")).agg(count(lit(1)).as("cs"))
      .localCheckpoint()
    val global = gc.groupBy(col("token")).agg(sum(col("cs")).as("cg"))
    val stats = global.agg(sum(col("cg")).as("nn"), count(lit(1)).as("v"))
    val gn = gc.groupBy(col("g")).agg(sum(col("cs")).as("ns"))
    val p = col("cs").cast("double") / col("ns").cast("double")
    val q = (col("cg") + lit(1L)).cast("double") /
      (col("nn") + col("v")).cast("double")
    def grid(c: Column) = round(c * lit(1e9)).cast("long")
    gc.join(global, "token").join(gn, "g").crossJoin(broadcast(stats))
      .select(col("g"), col("ns"),
        grid(-(p * log(p))).as("th"),
        grid(-(p * log(q))).as("tce"),
        grid(p * log(p / q)).as("tkl"))
      .groupBy(col("g"))
      .agg(max(col("ns")).as("n_tokens"),
        round(sum(col("th")).cast("double") / lit(1e9), 6).as("entropy"),
        round(sum(col("tce")).cast("double") / lit(1e9), 6)
          .as("cross_entropy"),
        round(sum(col("tkl")).cast("double") / lit(1e9), 6).as("kl_nats"))
      .withColumnRenamed("g", groupCol)
  }

  /** (id, n_tokens, nll): mean per-token negative log-likelihood,
    * rounded to 6dp. Documents with zero tokens cannot occur under the
    * whitespace tokenizer (splitting any string yields ≥1 token, possibly
    * empty-string — which is itself a vocabulary entry, same as the
    * oracle's unnest). */
  def nll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // localCheckpoint the vocabulary-sized count table: the stats
    // aggregate and the scoring join would otherwise each re-execute
    // the full corpus explode+groupBy lineage — three corpus
    // tokenization passes for one query instead of one
    val counts = tokenCounts(docs, textCol).localCheckpoint()
    val stats = counts.agg(sum(col("c")).as("n"),
      count(lit(1)).as("v"))
    val toks = docs.select(col(idCol),
      explode(TokenOps.tokenize(col(textCol))).as("token"))
    toks.join(counts, "token")
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        nllQuantized(col("c"), col("n"), col("v")).as("nq"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("nq")).cast("double") / lit(1e9)
          / count(lit(1)).cast("double"), 6).as("nll"))
  }
}
