package graft.ml

/** Shared styling for the dependency-free SVG chart renderers
  * ([[ModelComparison]], [[ModelCharts]]): ONE palette + XML escape, so
  * the per-model and cross-model artifacts read as one system and a
  * tweak in one renderer cannot silently diverge the others.
  *
  * Series palette is CVD-checked in fixed order; the aqua slot sits
  * below 3:1 contrast on the light surface, which is why every mark
  * carries a visible value label (the relief rule). Slot 0 doubles as
  * the single-line color (ROC curve). */
private[ml] object SvgStyle {
  val Surface = "#fcfcfb"
  val InkPrimary = "#0b0b0b"
  val InkSecondary = "#52514e"
  val GridColor = "#e5e4e0"
  val SeriesColors = Vector(
    "#2a78d6", "#eb6834", "#1baf7a", "#eda100",
    "#e87ba4", "#008300", "#4a3aa7", "#e34948")
  val LinePrimary: String = SeriesColors(0)

  def esc(s: String): String = s.flatMap {
    case '&' => "&amp;"; case '<' => "&lt;"; case '>' => "&gt;"
    case '"' => "&quot;"; case c => c.toString
  }
}
