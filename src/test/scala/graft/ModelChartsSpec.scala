package graft

import java.nio.file.{Files, Paths}
import javax.xml.parsers.DocumentBuilderFactory

import org.apache.spark.sql.functions._
import graft.ml.{BinaryMetrics, ModelCharts}

/** Per-model chart artifacts (the reference's `model_*.py` confusion
  * heatmap + ROC curve and `preprocessing.py`'s label-distribution bar):
  * every SVG must be well-formed XML, carry the data as visible text (no
  * number is color-alone), and reject unbounded inputs loudly.
  */
class ModelChartsSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory("charts").resolve(name).toString

  /** Well-formedness gate: parse with the JDK's namespace-aware builder
    * (throws on malformed markup, unescaped entities, unclosed tags). */
  private def parseSvg(path: String): org.w3c.dom.Document = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    f.newDocumentBuilder().parse(new java.io.File(path))
  }

  private def svgText(path: String): String =
    new String(Files.readAllBytes(Paths.get(path)), "UTF-8")

  test("confusion heatmap: well-formed, one cell per class pair, counts annotated") {
    import spark.implicits._
    val cm = Seq((0L, 0L, 40L), (0L, 1L, 10L), (1L, 0L, 7L), (1L, 1L, 43L))
      .toDF("label", "prediction", "n")
    val p = tmp("cm.svg")
    ModelCharts.writeConfusionHeatmapSvg(cm, p)
    val doc = parseSvg(p)
    assert(doc.getElementsByTagName("rect").getLength >= 5) // surface + 4 cells
    val txt = svgText(p)
    Seq("40", "10", "7", "43", "Predicted", "Actual", "Confusion Matrix")
      .foreach(s => assert(txt.contains(s), s"missing '$s'"))
  }

  test("confusion heatmap: missing (label,prediction) pairs render as zero cells") {
    import spark.implicits._
    // diagonal-only confusion (a perfect classifier) still yields a 2x2 grid
    val cm = Seq((0L, 0L, 5L), (1L, 1L, 5L)).toDF("label", "prediction", "n")
    val p = tmp("cm0.svg")
    ModelCharts.writeConfusionHeatmapSvg(cm, p)
    val txt = svgText(p)
    assert(txt.contains(">0<")) // the off-diagonal zero is annotated
    parseSvg(p)
  }

  test("ROC curve: well-formed, polyline present, AUC in legend, axes labeled") {
    import spark.implicits._
    val scored = Seq((0.9, 1L), (0.8, 1L), (0.7, 0L), (0.4, 1L), (0.3, 0L),
      (0.1, 0L)).toDF("score", "label")
    val roc = BinaryMetrics.exactRoc(scored, "score", "label")
    val auc = BinaryMetrics.exactAuc(scored, "score", "label")
    val p = tmp("roc.svg")
    ModelCharts.writeRocSvg(roc, auc, p)
    val doc = parseSvg(p)
    assert(doc.getElementsByTagName("polyline").getLength == 1)
    val txt = svgText(p)
    assert(txt.contains(f"AUC = $auc%.4f"))
    Seq("False Positive Rate", "True Positive Rate", "stroke-dasharray")
      .foreach(s => assert(txt.contains(s), s"missing '$s'"))
  }

  test("ROC curve: binned input stays under the point cap at any corpus size") {
    import spark.implicits._
    val scored = spark.range(5000).select(
      (rand(7) * 0.999).as("score"), (rand(11) > 0.5).cast("long").as("label"))
    val roc = BinaryMetrics.binnedRoc(scored, "score", "label", bins = 1000)
    val p = tmp("rocb.svg")
    ModelCharts.writeRocSvg(roc, 0.5, p) // ≤1000 points by construction
    parseSvg(p)
  }

  test("ROC curve: refuses unbounded exact input past maxPoints") {
    import spark.implicits._
    val scored = spark.range(200).select(
      (col("id") / 200.0).as("score"), (col("id") % 2).as("label"))
    val roc = BinaryMetrics.exactRoc(scored, "score", "label")
    intercept[IllegalArgumentException] {
      ModelCharts.writeRocSvg(roc, 0.5, tmp("rocx.svg"), maxPoints = 50)
    }
  }

  test("label distribution: well-formed, one bar + count label per class") {
    import spark.implicits._
    val dist = Seq((0L, 799L), (1L, 801L)).toDF("label", "n")
    val p = tmp("dist.svg")
    ModelCharts.writeLabelDistributionSvg(dist, p)
    val doc = parseSvg(p)
    assert(doc.getElementsByTagName("path").getLength == 2)
    val txt = svgText(p)
    Seq("799", "801", "Label Distribution")
      .foreach(s => assert(txt.contains(s), s"missing '$s'"))
  }

  test("Train.writeCharts emits both SVGs from a fitted model") {
    // Tiny but REAL fit: the charts must come off a genuine predictions
    // frame (probability vector for LR), not a hand-built stand-in.
    import spark.implicits._
    val labeled = graft.Tables.documents(spark, sf001).select(
      when(col("lang") === "en", 1.0).otherwise(0.0).as("label"),
      col("text"))
    val r = graft.app.Train.trainEval(labeled, "lr")
    val dir = Files.createTempDirectory("traincharts").toString
    graft.app.Train.writeCharts(r, "lr", dir)
    Seq("lr_confusion_matrix.svg", "lr_roc_curve.svg").foreach { f =>
      val p = Paths.get(dir, f)
      assert(Files.exists(p), s"missing $f")
      parseSvg(p.toString)
    }
    r.close() // trainEval persists; Result owns the cache lifetime
  }

  test("confusion grid: N aligned panels, per-model titles, y labels once") {
    val panels = Seq(
      "lr" -> Seq((0L, 0L, 40L), (0L, 1L, 10L), (1L, 0L, 7L), (1L, 1L, 43L)),
      "nb" -> Seq((0L, 0L, 35L), (0L, 1L, 15L), (1L, 0L, 12L), (1L, 1L, 38L)),
      "svm" -> Seq((0L, 0L, 41L), (0L, 1L, 9L), (1L, 0L, 8L), (1L, 1L, 42L)))
    val p = tmp("grid.svg")
    ModelCharts.writeConfusionGrid(panels, p, "Confusion Matrix Comparison")
    val doc = parseSvg(p)
    // surface + 3 panels x 4 cells
    assert(doc.getElementsByTagName("rect").getLength >= 13)
    val txt = svgText(p)
    Seq("lr", "nb", "svm", "40", "35", "41", "Confusion Matrix Comparison",
      "Actual").foreach(s => assert(txt.contains(s), s"missing '$s'"))
    // "Predicted" under every panel, "Actual" only once on the left
    assert("Predicted".r.findAllIn(txt).size == 3)
    assert("Actual".r.findAllIn(txt).size == 1)
  }

  test("confusion grid: single empty panel is rejected loudly") {
    intercept[IllegalArgumentException] {
      ModelCharts.writeConfusionGrid(Seq("lr" -> Seq.empty), tmp("bad.svg"), "x")
    }
  }

  test("length comparison: boxes, overlaid bars, marker line, legend") {
    val before = Seq((0, 10L), (5, 40L), (10, 25L), (135, 5L), (140, 2L))
    val after = Seq((0, 30L), (5, 35L), (10, 12L))
    val p = tmp("len.svg")
    ModelCharts.writeLengthComparisonSvg(before, after,
      ModelCharts.BoxSummary(1, 4, 8, 80, 142),
      ModelCharts.BoxSummary(0, 3, 6, 11, 60),
      binWidth = 5, p)
    val doc = parseSvg(p)
    val txt = svgText(p)
    Seq("Before", "After", "140 chars", "stroke-dasharray",
      "Text length (characters)").foreach(s =>
      assert(txt.contains(s), s"missing '$s'"))
    // 2 IQR boxes + 8 histogram bars + legend swatches + surface
    assert(doc.getElementsByTagName("rect").getLength >= 12)
  }

  test("length comparison: non-monotone box summary is rejected") {
    intercept[IllegalArgumentException] {
      ModelCharts.BoxSummary(10, 4, 8, 9, 12) // min > q1
    }
  }

  test("Preprocess length aggregates: bins sum to rows, summary is monotone") {
    val docs = graft.Tables.documents(spark, sf001)
    val hist = graft.app.Preprocess.collectHist(
      graft.app.Preprocess.lengthHistogram(docs))
    assert(hist.map(_._2).sum === docs.count())
    assert(hist.map(_._1) === hist.map(_._1).sorted, "bins must be ordered")
    assert(hist.forall(_._1 <= 300), "lengths must clamp into the last bin")
    val box = graft.app.Preprocess.collectBox(
      graft.app.Preprocess.lengthSummary(docs))
    assert(box.min <= box.q1 && box.q1 <= box.median &&
      box.median <= box.q3 && box.q3 <= box.max)
  }

  test("rocScore uses probability when present, sigmoid(margin) otherwise") {
    import spark.implicits._
    // SVC path: no probability column → sigmoid of rawPrediction[1].
    val labeled = graft.Tables.documents(spark, sf001).select(
      when(col("lang") === "en", 1.0).otherwise(0.0).as("label"),
      col("text"))
    val r = graft.app.Train.trainEval(labeled, "svm")
    assert(!r.predictions.columns.contains("probability"))
    val scores = r.predictions
      .select(graft.app.Train.rocScore(r.predictions).as("s"))
      .agg(min(col("s")), max(col("s"))).head()
    assert(scores.getDouble(0) >= 0.0 && scores.getDouble(1) <= 1.0)
    r.close() // trainEval persists; Result owns the cache lifetime
  }
}
