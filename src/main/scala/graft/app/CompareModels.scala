package graft.app

import graft.ml.ModelComparison

/** Model-comparison entry point (`/root/reference/compare_models.py`):
  * read the per-model metrics JSONs written by [[Train]] and emit one
  * ranked comparison artifact.
  *
  * Usage: graft.app.CompareModels <outJson> <name=metricsPath> [<name=metricsPath> ...]
  */
object CompareModels {
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
    val cmp = ModelComparison.compare(spark, inputs)
    cmp.show(truncate = false)
    ModelComparison.writeComparison(cmp, outPath)
    // chart artifacts beside the JSON (compare_models.py's PNG analogs:
    // the metric bars and the 1×N confusion-matrix heatmap grid)
    val svgPath = outPath.replaceAll("\\.json$", "") + ".svg"
    ModelComparison.writeComparisonSvg(cmp, svgPath)
    val (withCm, withoutCm) = cmp.collect().toSeq
      .partition(r => (4 to 7).forall(!r.isNullAt(_)))
    // loud, not silent: a model missing its confusion_matrix field still
    // appears in the bars chart, so an unexplained missing panel here
    // would read as a render bug
    withoutCm.foreach(r => System.err.println(
      s"[compare] ${r.getString(0)}: metrics JSON has no confusion_matrix — omitted from the grid"))
    val panels = withCm.map { r =>
      r.getString(0) -> Seq(
        (0L, 0L, r.getLong(4)), (0L, 1L, r.getLong(5)),
        (1L, 0L, r.getLong(6)), (1L, 1L, r.getLong(7)))
    }
    if (panels.nonEmpty)
      graft.ml.ModelCharts.writeConfusionGrid(panels,
        outPath.replaceAll("\\.json$", "") + "_confusion.svg",
        "Confusion Matrix Comparison")
    println(s"best=${ModelComparison.best(cmp)}")
    spark.stop()
  }
}
