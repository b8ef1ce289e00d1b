package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collocation mining: pointwise mutual information over document-level
  * co-occurrence — "which token pairs appear together far more often
  * than chance" (Church & Hanks, CL 1990), the corpus-analysis verb
  * behind phrase detection, topic seeding, and stop-phrase lists in a
  * training-data pipeline. The reference pipeline counts tokens
  * (`/root/reference/preprocessing.py` tokenize stage) but never
  * correlates them; this is the next analysis a corpus team runs.
  *
  * PMI(a,b) = ln( P(a,b) / (P(a)·P(b)) ) over document presence:
  * with N docs, df(x) docs containing x, and df(a,b) docs containing
  * both, PMI = ln( df(a,b)·N / (df(a)·df(b)) ). Reported on the
  * [[UnigramLM]] nano grid (round(ln·1e9) as a long) so both engines
  * agree bit-for-bit.
  *
  * Scale shape and its guard: pair counting is a self-join of the
  * per-doc DISTINCT token sets on doc_id — per-doc quadratic, the
  * [[SpanDedup]]/[[FuzzyJoin]] cost profile. Two bounds keep it honest:
  * (1) the vocabulary filter (df ≥ minDf) shrinks every doc's set to
  * frequent tokens BEFORE the join — rare tokens cannot clear a pair
  * support threshold anyway, so nothing the output keeps is lost; and
  * (2) the exact candidate volume Σ_doc |set|² is probed FIRST through
  * [[JoinDiagnostics.requireBounded]] — the explosion fails loudly
  * before a single pair materializes.
  */
object Collocations {

  /** (tok_a, tok_b, n_ab, df_a, df_b, pmi_nano) for token pairs
    * co-occurring in ≥ `minPairDf` documents, both tokens in ≥ `minDf`
    * documents. `maxCandidates` bounds the exact self-join volume. */
  def pmiPairs(docs: DataFrame, idCol: String, textCol: String,
      minDf: Long = 5L, minPairDf: Long = 5L,
      maxCandidates: Long = 100000000L): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"),
        explode(TokenOps.tokenize(col(textCol))).as("tok"))
      .distinct()
    val dfs = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val nDocs = docs.select(col(idCol)).distinct()
      .agg(count(lit(1)).as("n_docs"))
    // vocabulary filter BEFORE the self-join (broadcast: the df table
    // is vocabulary-sized), then the loud candidate-volume probe
    val vt = toks.join(broadcast(dfs.select(col("tok"))), "tok")
      .localCheckpoint() // both join sides below — materialize once
    JoinDiagnostics.requireBounded(vt, vt, Seq("doc_id"), maxCandidates)
    val pairs = vt.as("a")
      .join(vt.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.tok") < col("b.tok"))
      .groupBy(col("a.tok").as("tok_a"), col("b.tok").as("tok_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairDf)
    pairs
      .join(broadcast(dfs.select(col("tok").as("tok_a"), col("df").as("df_a"))),
        "tok_a")
      .join(broadcast(dfs.select(col("tok").as("tok_b"), col("df").as("df_b"))),
        "tok_b")
      .crossJoin(broadcast(nDocs))
      .select(col("tok_a"), col("tok_b"), col("n_ab"), col("df_a"),
        col("df_b"),
        round(log(col("n_ab").cast("double") * col("n_docs") /
          (col("df_a") * col("df_b"))) * lit(1e9)).cast("long")
          .as("pmi_nano"))
  }
}
