package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ColumnOps

/** Byte-pair-encoding tokenizer TRAINING and encoding as DataFrame
  * operators — the real-subword sibling of [[TokenOps.bpeTokenCount]]'s
  * pretokenizer-only count. A training-data engine that reports token
  * budgets needs the merge-table machinery itself: train on the corpus,
  * encode with the learned merges, count actual subword tokens.
  *
  * Classic Sennrich BPE over the shared whitespace pretokenizer:
  *
  *  1. word-frequency table (one explode + groupBy — vocabulary-sized,
  *     sublinear in corpus; ALL later training passes run on this table,
  *     never the corpus again — the standard industrial-BPE shape);
  *  2. words split to character symbols; each merge round counts
  *     adjacent symbol pairs weighted by word frequency (groupBy over a
  *     charset²-bounded key space), picks the max (ties → lexicographic
  *     (left, right) — deterministic), and rewrites symbol arrays with a
  *     row-local left-to-right non-overlapping fold;
  *  3. encoding re-applies the merge list per word as the same row-local
  *     fold — scan-stage, zero shuffles, no join against a vocab table.
  *
  * Only the per-round best pair (one row) ever reaches the driver; the
  * symbol table stays distributed. Character splitting is per UTF-16 code
  * unit (`split(word, "")`), matching the fixtures' ASCII corpus; a
  * surrogate-aware engine would pre-map to code points first.
  *
  * All counts are exact integers and every decision is deterministic —
  * no float drift, no RNG — so the whole family is hash-oracle-checkable:
  * pair statistics directly, and the merge loop + encoding through
  * unrolled per-round CTE mirrors (DuckDB `list_reduce` reproduces
  * [[applyMerge]]'s fold exactly — see CorpusQueries).
  */
object Bpe {

  /** One learned merge rule: rank-th round merged (left, right) which
    * occurred `count` weighted times. */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** (word, freq) under the shared whitespace tokenizer. */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TokenOps.tokenize(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Word → initial character symbols. Java's zero-width split keeps a
    * trailing "" under limit -1; drop the empties so symbols are exactly
    * the characters (the oracle's `regexp_extract_all(word, '.')`). */
  def charSymbols(word: Column): Column =
    filter(split(word, ""), c => c =!= lit(""))

  /** Adjacent symbol pairs of one row's symbol array, as (l, r) structs —
    * row-local; `bind` keeps the array evaluated once per row. */
  private def adjacentPairs(syms: Column): Column =
    ColumnOps.bind(syms, s =>
      transform(slice(s, lit(1), size(s) - 1),
        (x, i) => struct(x.as("l"), element_at(s, i + lit(2)).as("r"))))

  /** (left, right, cnt): adjacent-pair counts over a (syms, freq) symbol
    * table, weighted by word frequency. Exact integers. */
  def pairCounts(symbols: DataFrame): DataFrame =
    symbols.filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(adjacentPairs(col("syms"))).as("p"))
      .groupBy(col("p.l").as("left"), col("p.r").as("right"))
      .agg(sum(col("freq")).as("cnt"))

  /** Left-to-right non-overlapping merge of (left, right) → left+right in
    * one symbol array: a row-local fold. The merged symbol is the
    * concatenated STRING, so "aa" born from (a,a) cannot re-pair with a
    * consumed "a" — exactly Sennrich's scan semantics. */
  def applyMerge(syms: Column, left: String, right: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (out, c) => when(
        size(out) > 0 && element_at(out, -1) === lit(left) && c === lit(right),
        concat(slice(out, lit(1), size(out) - 1), array(lit(left + right))))
        .otherwise(concat(out, array(c))))

  /** Train `nMerges` rounds on the corpus. Returns the merge table and
    * the final (word, freq, syms) symbol table. Stops early when no pair
    * remains (all words fully merged). The symbol table is vocabulary-
    * sized; each round is one bounded aggregation plus a 1-row collect. */
  def train(docs: DataFrame, textCol: String,
      nMerges: Int): (Seq[Merge], DataFrame) = {
    // localCheckpoint materializes the vocabulary-sized table and
    // TRUNCATES its lineage: without it, round i's collect would
    // re-execute the corpus explode + word groupBy plus all i-1 prior
    // fold projections (O(rounds²) recompute over the corpus — exactly
    // what the "never the corpus again" contract forbids). With it,
    // each round is one bounded aggregation over the checkpointed
    // vocab table plus one vocab-sized rewrite.
    var symbols = wordFreqs(docs, textCol)
      .select(col("word"), col("freq"), charSymbols(col("word")).as("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    for (rank <- 1 to nMerges if !exhausted) {
      val best = pairCounts(symbols)
        .orderBy(col("cnt").desc, col("left"), col("right"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(rank, l, r, c)
        symbols = symbols
          .withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint()
      }
    }
    (merges.toSeq, symbols)
  }

  /** Encode one word column through the merge list — a row-local fold
    * chain, no vocab join. */
  def encodeWord(word: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(charSymbols(word))((s, m) => applyMerge(s, m.left, m.right))

  /** The encoded-token array of a text column — tokenize, per-word fold,
    * flatten; the row-local core [[encode]] and the fertility readout
    * share. */
  def encodeTokens(text: Column, merges: Seq[Merge]): Column =
    flatten(transform(TokenOps.tokenize(text), w => encodeWord(w, merges)))

  /** (id, n_bpe_tokens, tokens): every document encoded through the
    * merge list. Scan-stage. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame =
    docs.select(col(idCol), encodeTokens(col(textCol), merges).as("tokens"))
      .select(col(idCol), size(col("tokens")).cast("long").as("n_bpe_tokens"),
        col("tokens"))
}
