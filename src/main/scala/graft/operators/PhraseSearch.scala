package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact phrase search over a positional inverted index — the retrieval
  * verb [[Bm25]]'s bag-of-words postings cannot answer ("slow hash
  * batch" AS A PHRASE, not three independent terms). The standard IR
  * construction (Manning/Raghavan/Schütze IIR §2.4): postings carry
  * token POSITIONS, and a phrase match is a positional intersection —
  * doc contains term_i at pos p+i for every i.
  *
  * Scale shape: each join leg is pre-filtered to ONE term's postings
  * (document-frequency-sized, not corpus-sized) and the legs are
  * intersected RAREST-FIRST, so the running candidate set never exceeds
  * the rarest term's postings — the classic query-optimizer ordering,
  * decided from a vocabulary-sized count aggregate. Every join is an
  * equi-join on (doc_id, pos±offset); the corpus text itself is
  * touched once, by the postings build.
  */
object PhraseSearch {

  /** Positional postings: (token, doc_id, pos) — 1-based token position
    * within the document. The persistent form a serving index stores
    * (bucketed by token, like [[Bm25.buildPostings]]). */
  def positionalPostings(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(TokenOps.tokenize(col(textCol))).as(Seq("p", "token")))
      .select(col("token"), col("doc_id"),
        (col("p") + 1).cast("long").as("pos"))

  /** Every occurrence of the consecutive token sequence `phrase`:
    * (doc_id, start_pos). Duplicate phrase terms are handled naturally
    * (each leg is an independent positional constraint). */
  def phraseOccurrences(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    require(phrase.forall(_.nonEmpty), "phrase contains an empty token")
    val post = positionalPostings(docs, idCol, textCol)
      .localCheckpoint() // every leg filters this one frame
    // rarest-first leg order, from a vocabulary-sized count (ties and
    // absent terms by cf=0 -> an absent term short-circuits to empty
    // via its empty leg, which the rarest-first order hits first)
    val cf = post
      .filter(col("token").isin(phrase.distinct: _*))
      .groupBy(col("token")).agg(count(lit(1)).as("cf"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val legs = phrase.zipWithIndex
      .sortBy { case (t, i) => (cf.getOrElse(t, 0L), i) }
    val head = legs.head
    val anchor = post.filter(col("token") === head._1)
      .select(col("doc_id"), (col("pos") - head._2).as("start_pos"))
    legs.tail.foldLeft(anchor) { case (acc, (t, off)) =>
      acc.join(post.filter(col("token") === t)
          .select(col("doc_id"), (col("pos") - off).as("start_pos")),
        Seq("doc_id", "start_pos"))
    }
  }

  /** Per-document phrase frequency: (doc_id, n_occurrences), documents
    * without the phrase absent (join back against the corpus for a
    * zero-filled report). */
  def phraseCounts(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame =
    phraseOccurrences(docs, idCol, textCol, phrase)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"))
}
