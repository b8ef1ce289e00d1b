package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINED character-n-gram language identification — the third tier
  * above [[LangId]]'s script and marker heuristics (the standard
  * langid.py / CLD recipe, Cavnar & Trenkle 1994 reduced to its
  * distributed core): fit per-language character-n-gram profiles from a
  * LABELED seed corpus in-engine, then score every document by summed
  * add-1-smoothed log-probability and take the argmax.
  *
  * Why a third tier: the marker tier is measurably near-chance on
  * Latin-script non-English (the repo's own q_cohens_kappa reads
  * κ≈0.002 against the corpus labels), and it cannot be EXTENDED — a
  * new language needs a hand-built function-word list. The trained tier
  * learns any language from a few sentences of labeled seed text.
  *
  * Scale shape (the 100 TB audit):
  *  - fit: one wordcount-shaped shuffle over the SEED (a labeled seed
  *    is sample-sized, not corpus-sized); the profile is gram-vocab × L
  *    rows behind a loud `maxVocab` guard.
  *  - predict: one wordcount shuffle to per-(doc, gram) counts, the
  *    profile BROADCAST onto it, one keyed reduce to (doc, lang)
  *    scores, and an L-row broadcast grid for the unseen-gram default —
  *    the corpus never shuffles by anything but its own keys.
  *
  * Cross-engine arithmetic: log-probs quantize to the 1e-9 nano grid
  * as LONGs at fit time, so every score is an exact integer sum
  * (order-free) and the argmax is deterministic; ties break to the
  * lexicographically greatest language via struct max (the [[LangId]]
  * convention). A document with no n-grams (null/short text) predicts
  * "und".
  */
object LangIdNgram {

  /** Fitted profile: `profile` = (lang, g, lp) per seen gram, `defaults`
    * = (lang, lp0) — the add-1 floor an unseen gram scores. Both are
    * plain DataFrames so serving layouts can persist them. */
  case class Model(profile: DataFrame, defaults: DataFrame, n: Int)

  /** All overlapping character n-grams of lower(text), 1-based. The
    * upper bound floors at 1 (the [[TokenOps.charBigrams]] guard:
    * Spark's `sequence(1, 0)` steps BACKWARD, it is not empty), so a
    * text shorter than n yields itself as its only gram. NULL text
    * yields a NULL array — greatest() ignores the NULL length, so
    * without the outer guard a null row would leak one NULL gram and
    * score the add-1 floor instead of falling through to "und". */
  def charGrams(text: Column, n: Int): Column = {
    val t = lower(text)
    when(t.isNotNull,
      transform(sequence(lit(1), greatest(length(t) - (n - 1), lit(1))),
        i => t.substr(i, lit(n))))
  }

  /** Fit per-language profiles over `seed` (labelCol, textCol). One
    * wordcount shuffle; the distinct-gram count probes BEFORE the
    * profile is broadcast anywhere (the ExactStats loud-guard
    * discipline — a runaway vocabulary means the seed is not the
    * curated sample this tier expects). */
  def fit(seed: DataFrame, labelCol: String, textCol: String,
      n: Int = 3, maxVocab: Long = 2000000L): Model = {
    val counts = seed
      .select(col(labelCol).as("lang"),
        explode(charGrams(col(textCol), n)).as("g"))
      .groupBy(col("lang"), col("g")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val v = counts.select(col("g")).distinct().count()
    require(v <= maxVocab,
      s"char-$n-gram seed vocabulary $v > maxVocab=$maxVocab — the " +
        "profile must stay broadcast-sized; shrink the seed or raise " +
        "maxVocab explicitly")
    val ltot = counts.groupBy(col("lang")).agg(sum(col("c")).as("nl"))
    def lpNano(num: Column, den: Column) =
      round(log(num.cast("double") / den.cast("double")) * lit(1e9))
        .cast("long")
    val profile = counts.join(broadcast(ltot), "lang")
      .select(col("lang"), col("g"),
        lpNano(col("c") + lit(1L), col("nl") + lit(v)).as("lp"))
    val defaults = ltot
      .select(col("lang"), lpNano(lit(1L), col("nl") + lit(v)).as("lp0"))
    Model(profile, defaults, n)
  }

  /** Argmax language per document: (idCol, lang_pred). "und" when the
    * document has no n-grams. */
  def predict(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val eg = docs
      .select(col(idCol).as("__id"),
        explode(charGrams(col(textCol), model.n)).as("g"))
      .groupBy(col("__id"), col("g")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val hits = eg.join(broadcast(model.profile), "g")
      .groupBy(col("__id"), col("lang"))
      .agg(sum(col("cnt") * col("lp")).as("s_hit"),
        sum(col("cnt")).as("m_hit"))
    val totals = eg.groupBy(col("__id")).agg(sum(col("cnt")).as("tg"))
    // docs × L grid: the L-row defaults frame broadcast over per-doc
    // totals (bounded nested loop BY CONSTRUCTION — L languages), so
    // unseen grams score the add-1 floor for every language
    val grid = totals.crossJoin(broadcast(model.defaults))
      .join(hits, Seq("__id", "lang"), "left")
      .select(col("__id"), col("lang"),
        (coalesce(col("s_hit"), lit(0L)) +
          (col("tg") - coalesce(col("m_hit"), lit(0L))) * col("lp0"))
          .as("score"))
    val best = grid.groupBy(col("__id"))
      .agg(max(struct(col("score"), col("lang"))).as("b"))
      .select(col("__id"), col("b.lang").as("__pred"))
    docs.select(col(idCol))
      .join(best, docs(idCol) === best("__id"), "left")
      .select(col(idCol),
        coalesce(col("__pred"), lit("und")).as("lang_pred"))
  }
}
