package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal — the CCNet/RefinedWeb-style scrub
  * every web-scale training corpus runs: lines that repeat across a
  * large fraction of documents (navigation, cookie banners, footers,
  * license blurbs) are template noise, not content, and inflate both
  * dedup signatures and the LM's memorization of junk. A line is
  * boilerplate when it appears in ≥ max(minLineDocs,
  * ceil(maxDocFrac·N)) DISTINCT documents; surviving lines rejoin in
  * their original order.
  *
  * Lines compare EXACTLY (no trimming/folding) — normalization is the
  * clean stage's job, upstream ([[TextClean.normalizeNfc]],
  * [[TextClean.cleanText]]); folding here would silently couple two
  * stages. Documents whose every line was boilerplate come back with
  * empty text (the row survives — dropping it is the caller's
  * decision, not a side effect).
  *
  * Scale shape: one posexplode (line count ~ corpus size), a
  * line-vocabulary distinct+count aggregate, the boilerplate set
  * BROADCAST back as a left-anti (it is tiny by construction — lines
  * crossing a ceil(maxDocFrac·N) document threshold number at most
  * lines-per-doc/maxDocFrac distinct values), and ONE doc-key shuffle
  * for reassembly via the [[EventOps.sessionPaths]] trick:
  * array_sort(collect_list(struct(pos, line))) in a single aggregation
  * — no window, no nondeterministic collect order. */
object Boilerplate {

  /** (idCol, textCol) with boilerplate lines removed; column names are
    * preserved so the result drops into the original pipeline. */
  def removeBoilerplate(docs: DataFrame, idCol: String, textCol: String,
      maxDocFrac: Double = 0.05, minLineDocs: Long = 2L): DataFrame = {
    require(maxDocFrac > 0.0 && maxDocFrac <= 1.0,
      s"maxDocFrac must be in (0,1], got $maxDocFrac")
    require(minLineDocs >= 2L,
      s"minLineDocs must be >= 2 (1 would delete every line), got $minLineDocs")
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val nFrame = docs.agg(count(lit(1)).as("__n"))
    val boiler = lines.select(col("line"), col(idCol)).distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("__ldf"))
      .crossJoin(broadcast(nFrame)) // 1-row scalar: corpus size
      .filter(col("__ldf") >= greatest(lit(minLineDocs),
        ceil(col("__n").cast("double") * lit(maxDocFrac)).cast("long")))
      .select(col("line"))
    val rebuilt = lines.join(broadcast(boiler), Seq("line"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")),
        "\n").as("__kept"))
    docs.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__kept"), lit("")).as(textCol))
  }
}
