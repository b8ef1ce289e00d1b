package graft.ml

import org.apache.spark.sql.DataFrame

/** Per-model evaluation charts — the reference's per-model matplotlib
  * artifacts re-expressed as dependency-free SVG renderers over
  * in-engine aggregates:
  *
  *   - confusion heatmap   (`/root/reference/model_logistic_regression.py:261-274`,
  *                          `model_naive_bayes.py:181-198`, `model_svm.py:263-287`)
  *   - ROC curve           (`model_logistic_regression.py:276-296`)
  *   - label distribution  (`preprocessing.py:44-52,118`)
  *
  * The reference collects predictions to pandas and plots driver-side;
  * here every chart input is already a bounded aggregate (confusion =
  * #classes² rows, binned ROC ≤ bins rows, label distribution =
  * #classes rows), so the collect inside each renderer is bounded BY
  * CONSTRUCTION at any corpus size — the 100 TB shape is the aggregate
  * that feeds the chart, not the chart itself.
  *
  * Styling matches [[ModelComparison.writeComparisonSvg]]: same surface /
  * ink / grid palette, value labels on every mark (no number is
  * color-alone), hover titles.
  */
object ModelCharts {

  import SvgStyle._

  private def write(path: String, svg: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), svg)

  /** Sequential single-hue ramp for the heatmap (reference uses
    * cmap="Blues"): interpolate lightness on the primary hue. t in [0,1]. */
  private def blues(t: Double): String = {
    val tt = math.min(1.0, math.max(0.0, t))
    // from near-white (#f3f7fc) to a deep blue (#174a8c)
    def lerp(a: Int, b: Int) = math.round(a + (b - a) * tt).toInt
    f"#${lerp(0xf3, 0x17)}%02x${lerp(0xf7, 0x4a)}%02x${lerp(0xfc, 0x8c)}%02x"
  }

  /** Text color readable against the ramp: ink on light cells, white on
    * dark (annot must survive the fill — sns.heatmap does the same). */
  private def annotColor(t: Double): String =
    if (t > 0.55) "#ffffff" else InkPrimary

  /** Confusion-matrix heatmap from the (label, prediction, n) aggregate
    * [[SentimentPipeline.confusionMatrix]] emits. Axes follow the
    * reference: x = Predicted, y = Actual, counts annotated per cell.
    * Works for any #classes (the reference is 2×2); the collect is
    * #classes² rows. */
  def writeConfusionHeatmapSvg(cm: DataFrame, path: String,
      title: String = "Confusion Matrix"): Unit =
    writeConfusionHeatmap(
      cm.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq,
      path, title)

  /** Same heatmap from already-collected (label, prediction, n) counts —
    * [[SentimentPipeline.Metrics.confusion]] is exactly this shape, so a
    * caller that just evaluated must not re-run the aggregation job to
    * chart it. */
  def writeConfusionHeatmap(rows: Seq[(Long, Long, Long)], path: String,
      title: String): Unit =
    writeConfusionGrid(Seq(("", rows)), path, title)

  /** One heatmap cell block (cells + predicted tick labels + optional
    * actual tick labels) drawn at (x0, y0). Color is normalized PER
    * PANEL (each matrix gets its own ramp, like one sns.heatmap call
    * per axis in the reference). */
  private def confusionPanel(sb: StringBuilder, x0: Int, y0: Int, cell: Int,
      classes: Seq[Long], rows: Seq[(Long, Long, Long)],
      yLabels: Boolean): Unit = {
    val n = classes.length
    val counts = rows.map { case (l, p, c) => (l, p) -> c }.toMap
    val maxC = math.max(1L, rows.map(_._3).max)
    for (i <- 0 until n; j <- 0 until n) { // i = actual row, j = predicted col
      val c = counts.getOrElse((classes(i), classes(j)), 0L)
      val t = c.toDouble / maxC
      val (x, y) = (x0 + j * cell, y0 + i * cell)
      sb ++= s"""<rect x="$x" y="$y" width="$cell" height="$cell" fill="${blues(t)}" stroke="$Surface" stroke-width="1">"""
      sb ++= s"""<title>actual ${classes(i)}, predicted ${classes(j)}: $c</title></rect>"""
      sb ++= s"""<text x="${x + cell / 2}" y="${y + cell / 2 + 4}" font-size="12" fill="${annotColor(t)}" text-anchor="middle">$c</text>"""
    }
    classes.zipWithIndex.foreach { case (cls, j) =>
      sb ++= s"""<text x="${x0 + j * cell + cell / 2}" y="${y0 + n * cell + 16}" font-size="11" fill="$InkSecondary" text-anchor="middle">$cls</text>"""
    }
    if (yLabels) classes.zipWithIndex.foreach { case (cls, i) =>
      sb ++= s"""<text x="${x0 - 10}" y="${y0 + i * cell + cell / 2 + 4}" font-size="11" fill="$InkSecondary" text-anchor="end">$cls</text>"""
    }
  }

  /** Confusion matrices for N models side by side — the reference's
    * `compare_models.py:43-58` 1×3 sns.heatmap grid. Panels share the
    * class axis (sorted union) so cells align; each panel normalizes its
    * own color ramp and carries its model name. Input is #models ×
    * #classes² values — driver-trivial at any corpus size. */
  def writeConfusionGrid(panels: Seq[(String, Seq[(Long, Long, Long)])],
      path: String, title: String): Unit = {
    require(panels.nonEmpty, "empty panel list")
    panels.foreach { case (name, rows) =>
      require(rows.nonEmpty, s"empty confusion matrix for '$name'") }
    require(panels.length <= 8, s"grid supports <= 8 panels (got ${panels.length})")
    val classes = panels.flatMap(_._2.flatMap(r => Seq(r._1, r._2))).distinct.sorted
    require(classes.length <= 32,
      s"confusion heatmap supports <= 32 classes (got ${classes.length})")
    val n = classes.length
    val cell = math.min(72, 288 / n)
    val gap = 28
    val (pl, pt, pr, pb) = (72, 48, 16, 56)
    val panelTitleH = if (panels.exists(_._1.nonEmpty)) 18 else 0
    val blockW = n * cell
    val w = pl + panels.length * blockW + (panels.length - 1) * gap + pr
    val h = pt + panelTitleH + n * cell + pb
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" viewBox="0 0 $w $h" font-family="system-ui, sans-serif">"""
    sb ++= s"""<rect width="$w" height="$h" fill="$Surface"/>"""
    sb ++= s"""<text x="$pl" y="24" font-size="14" font-weight="600" fill="$InkPrimary">${esc(title)}</text>"""
    val y0 = pt + panelTitleH
    panels.zipWithIndex.foreach { case ((name, rows), p) =>
      val x0 = pl + p * (blockW + gap)
      if (name.nonEmpty)
        sb ++= s"""<text x="${x0 + blockW / 2}" y="${pt + 10}" font-size="12" fill="$InkPrimary" text-anchor="middle">${esc(name)}</text>"""
      confusionPanel(sb, x0, y0, cell, classes, rows, yLabels = p == 0)
      sb ++= s"""<text x="${x0 + blockW / 2}" y="${h - 12}" font-size="11" fill="$InkSecondary" text-anchor="middle">Predicted</text>"""
    }
    sb ++= s"""<text x="16" y="${y0 + n * cell / 2}" font-size="11" fill="$InkSecondary" text-anchor="middle" transform="rotate(-90 16 ${y0 + n * cell / 2})">Actual</text>"""
    sb ++= "</svg>"
    write(path, sb.toString)
  }

  /** ROC curve from a (threshold/bin, fpr, tpr) frame —
    * [[BinaryMetrics.binnedRoc]] (≤ bins rows, the scale-safe input) or
    * [[BinaryMetrics.exactRoc]] at verification scale. Draws the curve,
    * the chance diagonal (dashed, as the reference), FPR/TPR axes and an
    * AUC legend. The collect is capped: more than `maxPoints` points is
    * a misuse (feed the binned form), not a silent truncation. */
  def writeRocSvg(roc: DataFrame, auc: Double, path: String,
      title: String = "ROC Curve", maxPoints: Int = 4096): Unit = {
    // Cap check on the RAW row count, before the null/NaN filter — a
    // frame with null rate rows must still trip the guard instead of
    // silently charting a truncated window.
    val raw = roc.limit(maxPoints + 1).collect()
    require(raw.length <= maxPoints,
      s"ROC has > $maxPoints points; pass BinaryMetrics.binnedRoc output instead")
    val pts0 = raw
      .map(r => (if (r.isNullAt(1)) Double.NaN else r.getDouble(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
      .filterNot(p => p._1.isNaN || p._2.isNaN)
    // Anchor at (0,0) and (1,1) like roc_curve's implicit endpoints.
    val pts = ((0.0, 0.0) +: pts0.sortBy(p => (p._1, p._2)) :+ (1.0, 1.0)).distinct

    val (w, h) = (480, 420)
    val (pl, pr, pt, pb) = (56, 16, 48, 56)
    val (plotW, plotH) = (w - pl - pr, h - pt - pb)
    def xOf(v: Double) = pl + v * plotW
    def yOf(v: Double) = pt + plotH - v * plotH
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" viewBox="0 0 $w $h" font-family="system-ui, sans-serif">"""
    sb ++= s"""<rect width="$w" height="$h" fill="$Surface"/>"""
    sb ++= s"""<text x="$pl" y="24" font-size="14" font-weight="600" fill="$InkPrimary">${esc(title)}</text>"""
    Seq(0.0, 0.25, 0.5, 0.75, 1.0).foreach { v =>
      sb ++= f"""<line x1="$pl" y1="${yOf(v)}%.1f" x2="${w - pr}" y2="${yOf(v)}%.1f" stroke="$GridColor" stroke-width="1"/>"""
      sb ++= f"""<line x1="${xOf(v)}%.1f" y1="$pt" x2="${xOf(v)}%.1f" y2="${pt + plotH}" stroke="$GridColor" stroke-width="1"/>"""
      sb ++= f"""<text x="${pl - 6}" y="${yOf(v) + 3}%.1f" font-size="10" fill="$InkSecondary" text-anchor="end">$v%.2f</text>"""
      sb ++= f"""<text x="${xOf(v)}%.1f" y="${pt + plotH + 14}" font-size="10" fill="$InkSecondary" text-anchor="middle">$v%.2f</text>"""
    }
    // chance diagonal (dashed) then the curve on top
    sb ++= f"""<line x1="${xOf(0)}%.1f" y1="${yOf(0)}%.1f" x2="${xOf(1)}%.1f" y2="${yOf(1)}%.1f" stroke="$InkSecondary" stroke-width="1" stroke-dasharray="5,4"/>"""
    val poly = pts.map(p => f"${xOf(p._1)}%.2f,${yOf(p._2)}%.2f").mkString(" ")
    sb ++= s"""<polyline points="$poly" fill="none" stroke="$LinePrimary" stroke-width="2"/>"""
    val aucLabel = if (auc.isNaN) "AUC = n/a" else f"AUC = $auc%.4f"
    sb ++= s"""<rect x="${w - pr - 150}" y="${pt + plotH - 34}" width="142" height="24" rx="4" fill="$Surface" stroke="$GridColor"/>"""
    sb ++= s"""<line x1="${w - pr - 142}" y1="${pt + plotH - 22}" x2="${w - pr - 122}" y2="${pt + plotH - 22}" stroke="$LinePrimary" stroke-width="2"/>"""
    sb ++= s"""<text x="${w - pr - 116}" y="${pt + plotH - 18}" font-size="11" fill="$InkPrimary">ROC (${esc(aucLabel)})</text>"""
    sb ++= s"""<text x="${pl + plotW / 2}" y="${h - 16}" font-size="11" fill="$InkSecondary" text-anchor="middle">False Positive Rate</text>"""
    sb ++= s"""<text x="16" y="${pt + plotH / 2}" font-size="11" fill="$InkSecondary" text-anchor="middle" transform="rotate(-90 16 ${pt + plotH / 2})">True Positive Rate</text>"""
    sb ++= "</svg>"
    write(path, sb.toString)
  }

  /** Label-distribution bar chart from a (label, n) aggregate —
    * [[graft.app.Preprocess.classDistribution]]'s chart form
    * (`preprocessing.py:44-52`). Collect is #classes rows. */
  def writeLabelDistributionSvg(dist: DataFrame, path: String,
      title: String = "Label Distribution"): Unit = {
    val rows = dist.collect().map(r => (r.get(0).toString, r.getLong(1)))
    require(rows.nonEmpty, "empty label distribution")
    require(rows.length <= 64,
      s"label distribution supports <= 64 classes (got ${rows.length})")
    val maxN = math.max(1L, rows.map(_._2).max)

    val (w, h) = (480, 320)
    val (pl, pr, pt, pb) = (64, 16, 48, 48)
    val (plotW, plotH) = (w - pl - pr, h - pt - pb)
    val slotW = plotW.toDouble / rows.length
    val barW = math.min(64.0, slotW * 0.6)
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" viewBox="0 0 $w $h" font-family="system-ui, sans-serif">"""
    sb ++= s"""<rect width="$w" height="$h" fill="$Surface"/>"""
    sb ++= s"""<text x="$pl" y="24" font-size="14" font-weight="600" fill="$InkPrimary">${esc(title)}</text>"""
    Seq(0.0, 0.25, 0.5, 0.75, 1.0).foreach { f =>
      val y = pt + plotH - f * plotH
      sb ++= f"""<line x1="$pl" y1="$y%.1f" x2="${w - pr}" y2="$y%.1f" stroke="$GridColor" stroke-width="1"/>"""
      sb ++= f"""<text x="${pl - 6}" y="${y + 3}%.1f" font-size="10" fill="$InkSecondary" text-anchor="end">${math.round(maxN * f)}</text>"""
    }
    rows.zipWithIndex.foreach { case ((label, cnt), i) =>
      val x = pl + i * slotW + (slotW - barW) / 2
      val yT = pt + plotH - (cnt.toDouble / maxN) * plotH
      val yB = pt + plotH.toDouble
      val rr = math.min(4.0, yB - yT)
      sb ++= f"""<path d="M$x%.1f,$yB%.1f L$x%.1f,${yT + rr}%.1f Q$x%.1f,$yT%.1f ${x + rr}%.1f,$yT%.1f L${x + barW - rr}%.1f,$yT%.1f Q${x + barW}%.1f,$yT%.1f ${x + barW}%.1f,${yT + rr}%.1f L${x + barW}%.1f,$yB%.1f Z" fill="$LinePrimary">"""
      sb ++= s"""<title>${esc(label)}: $cnt</title></path>"""
      sb ++= f"""<text x="${x + barW / 2}%.1f" y="${yT - 5}%.1f" font-size="10" fill="$InkSecondary" text-anchor="middle">$cnt</text>"""
      sb ++= f"""<text x="${x + barW / 2}%.1f" y="${pt + plotH + 16}" font-size="11" fill="$InkSecondary" text-anchor="middle">${esc(label)}</text>"""
    }
    sb ++= "</svg>"
    write(path, sb.toString)
  }

  /** Five-number summary for a boxplot: (min, q1, median, q3, max). */
  final case class BoxSummary(min: Double, q1: Double, median: Double,
      q3: Double, max: Double) {
    require(min <= q1 && q1 <= median && median <= q3 && q3 <= max,
      s"summary not monotone: $this")
  }

  /** Before/after text-length comparison — the reference's
    * `preprocessing.py:125-148` figure (boxplot pair + overlaid
    * histograms) from bounded in-engine aggregates: each histogram is
    * ≤ (clampLen/binWidth + 1) bins and each box is ONE percentile
    * aggregation row, so nothing here scales with the corpus.
    * `marker` draws the reference's dashed 140-char tweet-limit line. */
  def writeLengthComparisonSvg(beforeHist: Seq[(Int, Long)],
      afterHist: Seq[(Int, Long)], beforeBox: BoxSummary, afterBox: BoxSummary,
      binWidth: Int, path: String,
      title: String = "Text Length: Before vs After Cleaning",
      marker: Option[Int] = Some(140)): Unit = {
    require(beforeHist.nonEmpty && afterHist.nonEmpty, "empty histogram")
    require(beforeHist.size <= 512 && afterHist.size <= 512,
      "too many bins — widen binWidth (the aggregate must stay bounded)")
    require(binWidth > 0, "binWidth must be positive")

    val (w, h) = (760, 340)
    val (pt, pb) = (56, 56)
    val plotH = h - pt - pb
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" viewBox="0 0 $w $h" font-family="system-ui, sans-serif">"""
    sb ++= s"""<rect width="$w" height="$h" fill="$Surface"/>"""
    sb ++= s"""<text x="24" y="24" font-size="14" font-weight="600" fill="$InkPrimary">${esc(title)}</text>"""
    val (beforeColor, afterColor) = (SeriesColors(1), SeriesColors(2))

    // Left panel: box pair on a shared y scale (length in chars).
    val (bpL, bpW) = (64, 160)
    val yMax = math.max(beforeBox.max, afterBox.max).max(1.0)
    def yOf(v: Double) = pt + plotH - (v / yMax) * plotH
    Seq(0.25, 0.5, 0.75, 1.0).foreach { f =>
      val y = yOf(yMax * f)
      sb ++= f"""<line x1="$bpL" y1="$y%.1f" x2="${bpL + bpW}" y2="$y%.1f" stroke="$GridColor" stroke-width="1"/>"""
      sb ++= f"""<text x="${bpL - 6}" y="${y + 3}%.1f" font-size="10" fill="$InkSecondary" text-anchor="end">${math.round(yMax * f)}</text>"""
    }
    Seq(("Before", beforeBox, beforeColor), ("After", afterBox, afterColor))
      .zipWithIndex.foreach { case ((label, b, color), i) =>
        val cx = bpL + (i * 2 + 1) * bpW / 4.0
        val bw = 36.0
        // whiskers
        sb ++= f"""<line x1="$cx%.1f" y1="${yOf(b.min)}%.1f" x2="$cx%.1f" y2="${yOf(b.q1)}%.1f" stroke="$InkSecondary" stroke-width="1"/>"""
        sb ++= f"""<line x1="$cx%.1f" y1="${yOf(b.q3)}%.1f" x2="$cx%.1f" y2="${yOf(b.max)}%.1f" stroke="$InkSecondary" stroke-width="1"/>"""
        Seq(b.min, b.max).foreach { v =>
          sb ++= f"""<line x1="${cx - bw / 4}%.1f" y1="${yOf(v)}%.1f" x2="${cx + bw / 4}%.1f" y2="${yOf(v)}%.1f" stroke="$InkSecondary" stroke-width="1"/>"""
        }
        // interquartile box + median
        sb ++= f"""<rect x="${cx - bw / 2}%.1f" y="${yOf(b.q3)}%.1f" width="$bw%.1f" height="${math.max(1.0, yOf(b.q1) - yOf(b.q3))}%.1f" fill="$color" fill-opacity="0.45" stroke="$color">"""
        sb ++= s"""<title>$label: min ${b.min}, q1 ${b.q1}, median ${b.median}, q3 ${b.q3}, max ${b.max}</title></rect>"""
        sb ++= f"""<line x1="${cx - bw / 2}%.1f" y1="${yOf(b.median)}%.1f" x2="${cx + bw / 2}%.1f" y2="${yOf(b.median)}%.1f" stroke="$InkPrimary" stroke-width="2"/>"""
        sb ++= f"""<text x="$cx%.1f" y="${pt + plotH + 16}" font-size="11" fill="$InkSecondary" text-anchor="middle">$label</text>"""
      }

    // Right panel: overlaid semi-transparent histograms.
    val (hiL, hiW) = (300, w - 300 - 24)
    val xMax = math.max(beforeHist.map(_._1).max, afterHist.map(_._1).max) + binWidth
    val nMax = math.max(1L, math.max(beforeHist.map(_._2).max, afterHist.map(_._2).max))
    def hx(v: Double) = hiL + (v / xMax) * hiW
    def hy(n: Long) = pt + plotH - (n.toDouble / nMax) * plotH
    Seq(0.25, 0.5, 0.75, 1.0).foreach { f =>
      val y = pt + plotH - f * plotH
      sb ++= f"""<line x1="$hiL" y1="$y%.1f" x2="${hiL + hiW}" y2="$y%.1f" stroke="$GridColor" stroke-width="1"/>"""
      sb ++= f"""<text x="${hiL - 6}" y="${y + 3}%.1f" font-size="10" fill="$InkSecondary" text-anchor="end">${math.round(nMax * f)}</text>"""
    }
    Seq((beforeHist, beforeColor, "Before"), (afterHist, afterColor, "After"))
      .foreach { case (hist, color, label) =>
        hist.foreach { case (bin, cnt) =>
          val (x1, x2) = (hx(bin), hx(bin + binWidth))
          sb ++= f"""<rect x="$x1%.1f" y="${hy(cnt)}%.1f" width="${math.max(0.5, x2 - x1 - 0.5)}%.1f" height="${math.max(0.0, pt + plotH - hy(cnt))}%.1f" fill="$color" fill-opacity="0.5">"""
          sb ++= s"""<title>$label [$bin, ${bin + binWidth}): $cnt</title></rect>"""
        }
      }
    marker.filter(_ <= xMax).foreach { m =>
      sb ++= f"""<line x1="${hx(m)}%.1f" y1="$pt" x2="${hx(m)}%.1f" y2="${pt + plotH}" stroke="${SeriesColors(7)}" stroke-width="1" stroke-dasharray="5,4"/>"""
      sb ++= f"""<text x="${hx(m) + 4}%.1f" y="${pt + 12}" font-size="10" fill="$InkSecondary">$m chars</text>"""
    }
    Seq(0.0, 0.5, 1.0).foreach { f =>
      sb ++= f"""<text x="${hiL + f * hiW}%.1f" y="${pt + plotH + 16}" font-size="10" fill="$InkSecondary" text-anchor="middle">${math.round(xMax * f)}</text>"""
    }
    // legend
    Seq((beforeColor, "Before", 0), (afterColor, "After", 1)).foreach { case (c, l, i) =>
      val lx = hiL + hiW - 150 + i * 80
      sb ++= s"""<rect x="$lx" y="34" width="10" height="10" fill="$c" fill-opacity="0.5"/>"""
      sb ++= s"""<text x="${lx + 14}" y="43" font-size="11" fill="$InkSecondary">$l</text>"""
    }
    sb ++= s"""<text x="${hiL + hiW / 2}" y="${h - 16}" font-size="11" fill="$InkSecondary" text-anchor="middle">Text length (characters)</text>"""
    sb ++= s"""<text x="16" y="${pt + plotH / 2}" font-size="11" fill="$InkSecondary" text-anchor="middle" transform="rotate(-90 16 ${pt + plotH / 2})">Length / Frequency</text>"""
    sb ++= "</svg>"
    write(path, sb.toString)
  }
}
