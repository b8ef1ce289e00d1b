package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tweet/document text-cleaning operator — the reference's preprocessing
  * clean chain re-expressed as pure Catalyst column expressions (codegen'd,
  * shuffle-free, fully pushdown-friendly).
  *
  * Semantics mirror `/root/reference/preprocessing.py:93-108`:
  *   - label normalization 0/4 → 0/1 (`preprocessing.py:93-96`)
  *   - lowercase (`:100`)
  *   - strip @mentions, URLs, '#', non-alpha → space, collapse whitespace
  *     (`:101-105`), trim (`:106`)
  *   - drop rows whose cleaned text is empty (`:108`)
  *
  * At 100 TB this is a single narrow `Project`+`Filter` stage: Catalyst's
  * `CollapseProject` folds the whole chain into one whole-stage-codegen'd
  * projection over the scan, no shuffle, no UDF.
  */
object TextClean {
  // Java-regex patterns kept inside the Java∩RE2 shared subset so the same
  // pattern strings are valid for the DuckDB oracle (SURVEY.md §7 risk note).
  val MentionPattern  = "@[A-Za-z0-9_]+"
  val UrlPattern      = "https?://\\S+"
  val HashPattern     = "#"
  val NonAlphaPattern = "[^a-zA-Z\\s]"
  val MultiWsPattern  = "\\s+"

  /** The full clean chain as a single Column expression. */
  def cleanText(text: Column): Column = {
    val c0 = lower(text)
    val c1 = regexp_replace(c0, MentionPattern, "")
    val c2 = regexp_replace(c1, UrlPattern, "")
    val c3 = regexp_replace(c2, HashPattern, "")
    val c4 = regexp_replace(c3, NonAlphaPattern, " ")
    val c5 = regexp_replace(c4, MultiWsPattern, " ")
    trim(c5)
  }

  /** Equivalent DuckDB SQL expression for the oracle (RE2 needs the
    * explicit 'g' flag; Java regexp_replace is global by default). */
  def cleanTextSql(textExpr: String): String = {
    val c0 = s"lower($textExpr)"
    val c1 = s"regexp_replace($c0, '@[A-Za-z0-9_]+', '', 'g')"
    val c2 = s"regexp_replace($c1, 'https?://\\S+', '', 'g')"
    val c3 = s"regexp_replace($c2, '#', '', 'g')"
    val c4 = s"regexp_replace($c3, '[^a-zA-Z\\s]', ' ', 'g')"
    val c5 = s"regexp_replace($c4, '\\s+', ' ', 'g')"
    s"trim($c5)"
  }

  /** Sentiment140 label normalization: 0/4 → 0/1 (`preprocessing.py:93-96`). */
  def normalizeLabel(sentiment: Column): Column =
    when(sentiment === 4, 1).otherwise(0)

  /** Apply the full preprocessing to a df with a text column: clean text,
    * add text_length, drop empty-cleaned rows. Output columns:
    * original non-text columns ++ (text = cleaned, text_length).
    */
  def clean(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn(textCol, cleanText(col(textCol)))
      .withColumn("text_length", length(col(textCol)).cast("long"))
      .filter(length(col(textCol)) > 0)
}
