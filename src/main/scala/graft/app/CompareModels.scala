package graft.app

import graft.ml.ModelComparison

/** Model-comparison entry point (`/root/reference/compare_models.py`):
  * read the per-model metrics JSONs written by [[Train]] and emit one
  * ranked comparison artifact.
  *
  * Usage: graft.app.CompareModels <outJson> <name=metricsPath> [<name=metricsPath> ...]
  */
object CompareModels {

  /** The whole comparison workflow minus session lifecycle, so callers
    * embedding it (bench smoke, tests) can run it inside their own
    * session. Returns the best model name. */
  def run(spark: org.apache.spark.sql.SparkSession, outPath: String,
      inputs: Seq[(String, String)]): String = {
    val cmp = ModelComparison.compare(spark, inputs)
    // ONE collect feeds the JSON, bar-SVG, and confusion-grid artifacts;
    // all field access inside the writers is by name, so a column
    // reorder in compare() can't silently mislabel anything.
    val rows = cmp.collect().toSeq
    ModelComparison.writeComparison(rows, outPath)
    // chart artifacts beside the JSON (compare_models.py's PNG analogs:
    // the metric bars and the 1×N confusion-matrix heatmap grid)
    val svgPath = outPath.replaceAll("\\.json$", "") + ".svg"
    ModelComparison.writeComparisonSvg(rows, svgPath)
    val (panels, missing) = ModelComparison.confusionPanels(rows)
    // loud, not silent: a model missing its confusion_matrix field still
    // appears in the bars chart, so an unexplained missing panel here
    // would read as a render bug
    missing.foreach(m => System.err.println(
      s"[compare] $m: metrics JSON has no confusion_matrix — omitted from the grid"))
    if (panels.nonEmpty)
      graft.ml.ModelCharts.writeConfusionGrid(panels,
        outPath.replaceAll("\\.json$", "") + "_confusion.svg",
        "Confusion Matrix Comparison")
    ModelComparison.best(rows)
  }

  def main(args: Array[String]): Unit = {
    val usage =
      "usage: graft.app.CompareModels <outJson> <name=metricsPath> [<name=metricsPath> ...]"
    require(args.length >= 2, usage)
    val outPath = args.head
    val inputs = args.tail.toSeq.map { a =>
      a.split("=", 2) match {
        case Array(name, path) if name.nonEmpty && path.nonEmpty => name -> path
        case _ => throw new IllegalArgumentException(
          s"bad argument '$a' (expected name=metricsPath)\n$usage")
      }
    }
    val spark = Sessions.local("graft-compare-models")
    val best = run(spark, outPath, inputs)
    println(s"best=$best")
    spark.stop()
  }
}
