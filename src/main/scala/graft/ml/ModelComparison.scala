package graft.ml

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model comparison report — the reference's `compare_models.py:13-58`
  * re-expressed as a DataFrame job: load each per-model metrics JSON
  * (the shape [[SentimentPipeline.metricsJson]] writes), stack them into
  * one comparison frame, rank by the chosen metric, and emit a single
  * comparison JSON artifact.
  *
  * The inputs are driver-sized (one small JSON per model), so the only
  * "scale" concern is honesty about that: files are read through
  * spark.read.json for schema discipline, and the comparison itself is a
  * few-row DataFrame the driver may safely collect.
  */
object ModelComparison {

  /** Fixed metrics schema (never inferSchema in library code). */
  val metricsSchema: StructType = StructType(Seq(
    StructField("accuracy", DoubleType),
    StructField("f1", DoubleType),
    StructField("roc_auc", DoubleType),
    StructField("confusion_matrix", ArrayType(ArrayType(LongType)))))

  /** Load one metrics JSON (multiLine: metricsJson spans lines). */
  def readMetrics(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(metricsSchema).option("multiLine", "true").json(path)

  /** Stack named metrics files into one frame:
    * (model, accuracy, f1, roc_auc, tn, fp, fn, tp), best first.
    * Mirrors compare_models.py's bar-chart input table. */
  def compare(spark: SparkSession, metricsByModel: Seq[(String, String)])
      : DataFrame = {
    val frames = metricsByModel.map { case (name, path) =>
      readMetrics(spark, path).select(
        lit(name).as("model"),
        round(col("accuracy"), 6).as("accuracy"),
        round(col("f1"), 6).as("f1"),
        round(col("roc_auc"), 6).as("roc_auc"),
        col("confusion_matrix")(0)(0).as("tn"),
        col("confusion_matrix")(0)(1).as("fp"),
        col("confusion_matrix")(1)(0).as("fn"),
        col("confusion_matrix")(1)(1).as("tp"))
    }
    frames.reduce(_.unionByName(_))
      .orderBy(col("accuracy").desc, col("model"))
  }

  /** Best model by accuracy (compare_models.py's implicit headline). */
  def best(comparison: DataFrame): String = best(comparison.collect())

  def best(rows: Seq[Row]): String = rows.head.getAs[String]("model")

  /** Write the comparison as one JSON array artifact (driver-side write:
    * the frame is #models rows by construction). NaN/null metrics (e.g.
    * a degenerate split making AUC undefined) serialize as JSON null —
    * bare NaN is invalid JSON; model names are string-escaped. */
  def writeComparison(comparison: DataFrame, path: String): Unit =
    writeComparison(comparison.collect(), path)

  /** Row-seq form: the app collects the few-row comparison ONCE and
    * feeds the same array to the JSON, bar-SVG, and confusion-grid
    * writers. Fields are read by NAME — the artifact writers don't
    * depend on [[compare]]'s column order. */
  def writeComparison(rows: Seq[Row], path: String): Unit = {
    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    def num(r: Row, name: String): String = {
      val i = r.fieldIndex(name)
      if (r.isNullAt(i) || r.getDouble(i).isNaN) "null" else r.getDouble(i).toString
    }
    def cnt(r: Row, name: String): String = {
      val i = r.fieldIndex(name)
      if (r.isNullAt(i)) "null" else r.getLong(i).toString
    }
    val out = rows.map { r =>
      s"""{"model": "${esc(r.getAs[String]("model"))}", "accuracy": ${num(r, "accuracy")},
         | "f1": ${num(r, "f1")}, "roc_auc": ${num(r, "roc_auc")},
         | "confusion_matrix": [[${cnt(r, "tn")}, ${cnt(r, "fp")}], [${cnt(r, "fn")}, ${cnt(r, "tp")}]]}"""
        .stripMargin
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      out.mkString("[", ",\n", "]"))
  }

  /** Per-model 2×2 confusion panels for [[ModelCharts.writeConfusionGrid]],
    * by-name field access; second element = models whose metrics JSON had
    * no confusion_matrix (callers should report them loudly, not drop
    * them silently). */
  def confusionPanels(rows: Seq[Row])
      : (Seq[(String, Seq[(Long, Long, Long)])], Seq[String]) = {
    val cells = Seq(("tn", 0L, 0L), ("fp", 0L, 1L), ("fn", 1L, 0L), ("tp", 1L, 1L))
    val (withCm, withoutCm) = rows.partition(r =>
      cells.forall { case (f, _, _) => !r.isNullAt(r.fieldIndex(f)) })
    (withCm.map(r => r.getAs[String]("model") ->
        cells.map { case (f, l, p) => (l, p, r.getAs[Long](f)) }),
      withoutCm.map(_.getAs[String]("model")))
  }

  // Palette + XML escape are shared with the per-model renderers —
  // [[SvgStyle]] keeps the chart artifacts one visual system. Series
  // colors are fixed-assignment (a model keeps its color regardless of
  // how many models are compared — never cycled).
  import SvgStyle.{SeriesColors, Surface, InkPrimary, InkSecondary, GridColor, esc}

  /** Render the comparison as a standalone grouped-bar SVG — the
    * counterpart of `compare_models.py:27-58`'s matplotlib PNG, emitted
    * driver-side with zero plotting dependencies. Metrics (accuracy, F1,
    * ROC AUC) are the x groups; models are the colored series, fixed
    * palette order, legend + per-bar value labels (no number is ever
    * color-alone). NaN/null metrics render as an "n/a" label instead of
    * a zero-height lie. */
  def writeComparisonSvg(comparison: DataFrame, path: String): Unit =
    writeComparisonSvg(comparison.collect(), path)

  def writeComparisonSvg(rows: Seq[Row], path: String): Unit = {
    require(rows.nonEmpty, "empty comparison")
    require(rows.length <= SeriesColors.size,
      s"at most ${SeriesColors.size} models per chart (got ${rows.length}); " +
        "facet or fold the rest")
    val models = rows.map(_.getAs[String]("model")).toSeq
    val metrics = Seq(("Accuracy", "accuracy"), ("F1", "f1"), ("ROC AUC", "roc_auc"))
    def metricOf(r: Row, name: String): Option[Double] = {
      val i = r.fieldIndex(name)
      if (r.isNullAt(i) || r.getDouble(i).isNaN) None else Some(r.getDouble(i))
    }

    val (w, h) = (640, 360)
    val (pl, pr, pt, pb) = (44, 16, 56, 32)
    val (plotW, plotH) = (w - pl - pr, h - pt - pb)
    val yOf = (v: Double) => pt + plotH - v * plotH
    val groupW = plotW.toDouble / metrics.size
    val barGap = 2.0
    val barW = math.min(36.0,
      (groupW * 0.7 - barGap * (models.size - 1)) / models.size)

    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" viewBox="0 0 $w $h" font-family="system-ui, sans-serif">"""
    sb ++= s"""<rect width="$w" height="$h" fill="$Surface"/>"""
    sb ++= s"""<text x="$pl" y="24" font-size="14" font-weight="600" fill="$InkPrimary">Model comparison</text>"""
    // legend (>= 2 series -> always present; swatch carries identity,
    // text stays in ink)
    var lx = pl
    models.zipWithIndex.foreach { case (m, i) =>
      sb ++= s"""<rect x="$lx" y="34" width="10" height="10" rx="2" fill="${SeriesColors(i)}"/>"""
      sb ++= s"""<text x="${lx + 14}" y="43" font-size="11" fill="$InkSecondary">${esc(m)}</text>"""
      lx += 14 + m.length * 7 + 14
    }
    // recessive grid + y labels
    Seq(0.0, 0.25, 0.5, 0.75, 1.0).foreach { v =>
      val y = yOf(v)
      sb ++= f"""<line x1="$pl" y1="$y%.1f" x2="${w - pr}" y2="$y%.1f" stroke="$GridColor" stroke-width="1"/>"""
      sb ++= f"""<text x="${pl - 6}" y="${y + 3}%.1f" font-size="10" fill="$InkSecondary" text-anchor="end">$v%.2f</text>"""
    }
    metrics.zipWithIndex.foreach { case ((label, colIdx), g) =>
      val gx = pl + g * groupW
      val total = models.size * barW + (models.size - 1) * barGap
      val x0 = gx + (groupW - total) / 2
      rows.zipWithIndex.foreach { case (r, i) =>
        val x = x0 + i * (barW + barGap)
        metricOf(r, colIdx) match {
          case Some(v) =>
            val yT = yOf(v); val yB = yOf(0.0)
            val rr = math.min(4.0, yB - yT) // rounded DATA end, square baseline
            sb ++= f"""<path d="M$x%.1f,$yB%.1f L$x%.1f,${yT + rr}%.1f Q$x%.1f,$yT%.1f ${x + rr}%.1f,$yT%.1f L${x + barW - rr}%.1f,$yT%.1f Q${x + barW}%.1f,$yT%.1f ${x + barW}%.1f,${yT + rr}%.1f L${x + barW}%.1f,$yB%.1f Z" fill="${SeriesColors(i)}">"""
            sb ++= s"""<title>${esc(models(i))} — $label: ${"%.4f".format(v)}</title></path>"""
            sb ++= f"""<text x="${x + barW / 2}%.1f" y="${yT - 4}%.1f" font-size="9" fill="$InkSecondary" text-anchor="middle">${"%.3f".format(v)}</text>"""
          case None =>
            sb ++= f"""<text x="${x + barW / 2}%.1f" y="${yOf(0.0) - 4}%.1f" font-size="9" fill="$InkSecondary" text-anchor="middle">n/a</text>"""
        }
      }
      sb ++= f"""<text x="${gx + groupW / 2}%.1f" y="${h - pb + 16}" font-size="11" fill="$InkSecondary" text-anchor="middle">$label</text>"""
    }
    sb ++= "</svg>"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)
  }
}
