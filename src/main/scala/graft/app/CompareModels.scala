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
    // chart artifact beside the JSON (compare_models.py's PNG analog)
    val svgPath = outPath.replaceAll("\\.json$", "") + ".svg"
    ModelComparison.writeComparisonSvg(cmp, svgPath)
    println(s"best=${ModelComparison.best(cmp)}")
    spark.stop()
  }
}
