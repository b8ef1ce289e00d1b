package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Marker-word language identification heuristic (no external models —
  * deterministic, codegen'd, runs at scan speed for 100 TB triage).
  *
  * Score per language = count of tokens hitting that language's
  * high-frequency function-word list; prediction = argmax (ties broken by
  * lexicographically greatest language code via struct ordering), "und"
  * when no marker hits.
  */
object LangId {

  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "you", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "ich", "zu", "den", "von"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est", "que", "pour", "dans", "vous"),
    "es" -> Seq("el", "los", "de", "que", "y", "en", "un", "se", "no", "por", "con", "para"),
    "it" -> Seq("il", "di", "che", "e", "la", "per", "una", "sono", "non", "con", "del", "si"))

  /** Per-language marker-hit score for a token array. */
  def score(tokens: Column, lang: String): Column =
    size(filter(tokens, t => t.isin(markers(lang): _*)))

  /** Best-scoring language code, or "und" if nothing matched. The token
    * array is let-bound so tokenization runs once, not once per
    * language scored. */
  def detect(tokens: Column): Column =
    graft.functions.ColumnOps.bind(tokens, toks => {
      val scored = markers.keys.toSeq.sorted.map { l =>
        struct(score(toks, l).as("s"), lit(l).as("lang"))
      }
      val best = array_max(array(scored: _*))
      when(best.getField("s") > 0, best.getField("lang")).otherwise(lit("und"))
    })

  def detectText(text: Column): Column = detect(TokenOps.tokenize(text))
}
