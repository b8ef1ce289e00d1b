package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.SentimentCsv

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table has the declared schema and non-null blobs") {
    val media = Multimodal.fakeMediaFromDocuments(Tables.documents(spark, sf001))
    assert(media.schema("bytes").dataType.typeName === "binary")
    assert(media.schema("meta").dataType.typeName === "struct")
    assert(media.filter($"bytes".isNull).count() === 0)
  }

  test("feature extraction: deterministic, fixed dim, batch-shaped") {
    val media = Multimodal.fakeMediaFromDocuments(Tables.documents(spark, sf001))
    val f1 = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(m => m.media_id -> m.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(m => m.media_id -> m.features.toSeq).toMap
    assert(f1 === f2, "stub decode must be deterministic")
    assert(f1.values.forall(_.size === 8))
    assert(f1.values.exists(_.exists(_ > 0.0)))
  }

  /** PNG bytes rendered in-process: left half black, right half white,
    * so band-pooled luminance has a known shape. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real image decode: true dimensions and pixel-derived features") {
    val bytes = pngBytes(64, 32)
    val img = Multimodal.decodeImage(bytes)
    assert(img.isDefined, "JDK must decode its own PNG output")
    val m = Multimodal.imageMeta(img.get)
    assert(m.width === 64 && m.height === 32 && m.channels === 3)
    val f = Multimodal.imageFeatures(img.get, 8)
    assert(f.length === 8)
    // left bands black (~0), right bands white (~1): real pixels, not a hash
    assert(f.take(4).forall(_ < 0.01) && f.drop(4).forall(_ > 0.99), f.toSeq)
  }

  test("corrupt or non-image bytes select the stub path, never throw") {
    assert(Multimodal.decodeImage("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(pngBytes(8, 8).take(20)).isEmpty) // truncated
    assert(Multimodal.decodeImage(null).isEmpty)
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)
  }

  test("extractFeatures routes real images to the pixel path in-engine") {
    val media = Seq(
      (1L, "image", pngBytes(16, 16)),
      (2L, "image", "plain text bytes".getBytes("UTF-8"))
    ).toDF("media_id", "kind", "bytes")
    val out = Multimodal.extractFeatures(media, dim = 4).collect()
      .map(m => m.media_id -> m).toMap
    assert(out(1L).width === 16 && out(1L).height === 16 &&
      out(1L).channels === 3)
    assert(out(2L).width === 0 && out(2L).height === 0 &&
      out(2L).channels === 0)
    assert(out(1L).features.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("frame offsets are evenly spaced and in-range") {
    val out = Seq(Array.fill[Byte](100)(1)).toDF("bytes")
      .select(Multimodal.frameOffsets($"bytes", 4)).as[Seq[Long]].head()
    assert(out === Seq(0L, 25L, 50L, 75L))
  }

  test("resize targets preserve aspect ratio, never upscale, floor at 1") {
    val meta = Seq((640, 480), (100, 50), (1, 1), (256, 1024))
      .toDF("width", "height")
      .select(struct($"width", $"height", lit(0L).as("duration_ms"),
        lit("stub").as("codec")).as("meta"))
    val out = meta.select(Multimodal.resizeTarget($"meta", 256).as("r"))
      .select($"r.width", $"r.height").as[(Int, Int)].collect().toSeq
    assert(out === Seq((256, 192), (100, 50), (1, 1), (64, 256)))
  }

  test("sentiment CSV round-trip: write clean, re-read, identical") {
    val df = Seq((1, "hello world"), (0, "bad, \"quoted\" text"))
      .toDF("label", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    SentimentCsv.writeClean(df, dir)
    val back = SentimentCsv.readClean(spark, dir)
    assert(back.as[(Int, String)].collect().toSet ===
      df.as[(Int, String)].collect().toSet)
    val inferred = SentimentCsv.readClean(spark, dir, infer = true)
    assert(inferred.schema("label").dataType.typeName === "integer")
  }

  test("JSONL round-trip and corrupt-line quarantine") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    // round-trip
    val df = Seq((1L, "hello"), (2L, "wörld \"quoted\"")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    graft.sources.JsonLines.write(df, dir)
    val back = graft.sources.JsonLines.read(spark, dir, schema)
    assert(back.as[(Long, String)].collect().toSet ===
      df.as[(Long, String)].collect().toSet)
    // quarantine: 2 good lines, 1 broken line — one read, clean split
    val qdir = java.nio.file.Files.createTempDirectory("graft-jsonl-q")
    java.nio.file.Files.writeString(qdir.resolve("a.jsonl"),
      """{"doc_id": 1, "text": "ok"}
        |{"doc_id": 2 "text": "missing comma"}
        |{"doc_id": 3, "text": "fine"}
        |""".stripMargin)
    val q2 =
      graft.sources.JsonLines.readQuarantine(spark, qdir.toString, schema)
    assert(q2.parsed.select($"doc_id").as[Long].collect().toSet === Set(1L, 3L))
    val quarantined = q2.quarantined.as[String].collect()
    assert(quarantined.length === 1 && quarantined.head.contains("missing comma"))
    q2.unpersist()
  }

  test("raw sentiment140 CSV reads with the fixed DDL schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-raw").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part.csv"),
      "4,\"1\",\"date\",\"NO_QUERY\",\"user1\",\"@you http://x.co nice!\"\n" +
      "0,\"2\",\"date\",\"NO_QUERY\",\"user2\",\"awful day\"\n")
    val df = SentimentCsv.readRaw(spark, dir)
    assert(df.schema.fieldNames.toSeq ===
      Seq("sentiment", "id", "date", "query", "user", "text"))
    assert(df.count() === 2)
    assert(df.filter($"sentiment" === 4).select($"text").as[String].head()
      .contains("@you"))
  }
}
