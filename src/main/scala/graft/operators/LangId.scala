package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Language identification heuristic (no external models —
  * deterministic, codegen'd, runs at scan speed for 100 TB triage).
  *
  * Two tiers, cheapest-sufficient-signal first:
  *
  *  1. SCRIPT detection for languages whose writing system identifies
  *     them: when script-range characters form the MAJORITY of a
  *     document's non-whitespace characters, the script decides —
  *     kana ⇒ ja (kanji+kana mix is Japanese, so kana outranks Han),
  *     hangul ⇒ ko, Thai/Lao/Myanmar/Khmer ⇒ th/lo/my/km, Han alone ⇒
  *     zh. Marker words can't see these languages at all (they have no
  *     whitespace-delimited function words to match), so before this
  *     tier every CJK document fell through to "und".
  *  2. MARKER words for Latin-script languages: score per language =
  *     count of tokens hitting that language's high-frequency
  *     function-word list; prediction = argmax (ties broken by
  *     lexicographically greatest language code via struct ordering),
  *     "und" when no marker hits.
  *
  * Both tiers are plain Column arithmetic (length-diff character
  * counts, one regexp_replace per script class — Catalyst's
  * subexpression elimination shares the repeated counts inside the one
  * projection), so the whole verb stays scan-stage at 100 TB.
  */
object LangId {

  // script character classes, explicit \x{...} ranges (the Java∩RE2
  // shared subset — script properties are not in it; see
  // TokenOps.WsFreeScriptClass)
  val KanaClass    = "[\\x{3040}-\\x{30FF}\\x{31F0}-\\x{31FF}]"
  val HangulClass  = "[\\x{AC00}-\\x{D7AF}]"
  val ThaiClass    = "[\\x{0E00}-\\x{0E7F}]"
  val LaoClass     = "[\\x{0E80}-\\x{0EFF}]"
  val MyanmarClass = "[\\x{1000}-\\x{109F}]"
  val KhmerClass   = "[\\x{1780}-\\x{17FF}]"
  val HanClass     = "[\\x{3400}-\\x{4DBF}\\x{4E00}-\\x{9FFF}\\x{F900}-\\x{FAFF}]"

  /** Count of characters matching a single-char class — the length-diff
    * trick, one codegen'd regexp_replace (mirror: the same expression
    * with DuckDB's explicit 'g' flag). */
  def charCount(text: Column, cls: String): Column =
    (length(text) - length(regexp_replace(text, cls, ""))).cast("long")

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

  /** Tiered detection over raw text: the script tier decides when
    * script-range characters are the MAJORITY of non-whitespace
    * characters (2·script > non-ws — a few loanword characters inside a
    * Latin document never flip it), else the marker-word argmax runs
    * over [[TokenOps.tokenize]]. On a pure-Latin corpus the script
    * counts are all zero and this is bit-identical to the marker tier
    * alone (every existing q_lang_id/q_slice_metrics oracle
    * re-verified). Kana is checked before Han: Japanese text mixes
    * kanji with kana, Chinese has no kana — the standard
    * disambiguation. */
  def detectText(text: Column): Column = {
    val nws = charCount(text, s"[^${TokenOps.WsChars}]")
    val kana = charCount(text, KanaClass)
    val hangul = charCount(text, HangulClass)
    val thai = charCount(text, ThaiClass)
    val lao = charCount(text, LaoClass)
    val my = charCount(text, MyanmarClass)
    val km = charCount(text, KhmerClass)
    val han = charCount(text, HanClass)
    val script = kana + hangul + thai + lao + my + km + han
    when(script * 2 > nws,
      when(kana > 0, "ja")
        .when(hangul > 0, "ko")
        .when(thai > 0, "th")
        .when(lao > 0, "lo")
        .when(my > 0, "my")
        .when(km > 0, "km")
        .otherwise("zh"))
      .otherwise(detect(TokenOps.tokenize(text)))
  }
}
