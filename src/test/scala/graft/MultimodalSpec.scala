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

  test("sampleFrameIndices mirrors frameOffsets' floor math, deduplicated") {
    // frameOffsets over a blob of length n IS floor(i*n/k) — the scalar
    // frame-index sampler must agree on every (n, k), so real AVI frame
    // sampling composes with the declared q_media_frames arithmetic
    for (n <- Seq(1, 2, 3, 4, 7, 8, 9, 100); k <- Seq(1, 3, 4, 8)) {
      val viaHof = Seq(Array.fill[Byte](n)(1)).toDF("bytes")
        .select(Multimodal.frameOffsets($"bytes", k)).as[Seq[Long]].head()
        .map(_.toInt).distinct
      assert(Multimodal.sampleFrameIndices(n, k) === viaHof, s"n=$n k=$k")
    }
    assert(Multimodal.sampleFrameIndices(0, 4) === Seq.empty)
    assert(Multimodal.sampleFrameIndices(5, 0) === Seq.empty)
  }

  test("video features really decode AVI frames (equal to per-frame decode)") {
    val (w, h, n) = (24, 16, 6)
    val frames = (0 until n).map(i => Multimodal.jpegFrame(w, h, 9L, i))
    val bytes = graft.operators.MediaContainers.avi(w, h, 40000L, frames)
    val Some((meta, ch, f)) = Multimodal.videoFeatures(bytes, dim = 4,
      maxFrames = 4)
    assert(meta.width === w && meta.height === h && ch === 3)
    // exactly the mean of the sampled frames' independently-decoded
    // band features — same floor-math sampling, same decode path
    val idx = Multimodal.sampleFrameIndices(n, 4)
    val expect = idx.map(i =>
        Multimodal.imageFeatures(Multimodal.decodeImage(frames(i)).get, 4))
      .transpose.map(xs => xs.sum / xs.size)
    assert(f.toSeq === expect, s"sampled $idx")
    assert(f.forall(v => v >= 0.0 && v <= 1.0))
    // corrupt AVI and non-AVI bytes: None (stub path), never a throw
    assert(Multimodal.videoFeatures(bytes.take(40), 4).isEmpty)
    assert(Multimodal.videoFeatures("not video".getBytes, 4).isEmpty)
  }

  test("extractFeatures routes AVI video real, MP4 video to the stub") {
    val media = Multimodal.containerMediaFromDocuments(
      Tables.documents(spark, sf001))
    val video = Multimodal.extractFeatures(media, dim = 8)
      .filter(_.kind == "video").collect()
    val (avi, mp4) = video.partition(_.media_id % 2 == 0)
    assert(avi.nonEmpty && mp4.nonEmpty)
    // AVI: real path — header dims + decoded channels populated
    assert(avi.forall(m => m.width >= 16 && m.height >= 16 && m.channels == 3))
    assert(avi.forall(_.features.forall(v => v >= 0.0 && v <= 1.0)))
    // MP4: stays behind the codec seam — stub zeroes the dims
    assert(mp4.forall(m => m.width == 0 && m.height == 0 && m.channels == 0))
    // the container generator itself is deterministic (JPEG encode and
    // all): identical bytes across two independent builds
    val once = media.filter($"media_id" % 6 === 2).select($"bytes")
      .as[Array[Byte]].head()
    val again = Multimodal.containerMediaFromDocuments(
        Tables.documents(spark, sf001))
      .filter($"media_id" % 6 === 2).select($"bytes")
      .as[Array[Byte]].head()
    assert(java.util.Arrays.equals(once, again))
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

  test("scalar resize-target math equals the Catalyst form on a dim grid") {
    val dims = for (w <- Seq(1, 15, 16, 17, 64, 640); h <- Seq(1, 12, 16, 48, 480))
      yield (w, h)
    val viaColumn = dims.toDF("w", "h")
      .select($"w", $"h",
        Multimodal.resizeTarget(struct($"w".as("width"), $"h".as("height")), 16)
          .as("r"))
      .select($"w", $"h", $"r.width", $"r.height")
      .as[(Int, Int, Int, Int)].collect()
      .map { case (w, h, rw, rh) => (w, h) -> ((rw, rh)) }.toMap
    dims.foreach { case (w, h) =>
      assert(Multimodal.resizeTargetDims(w, h, 16) === viaColumn((w, h)),
        s"scalar/Catalyst divergence at ($w, $h)")
    }
  }

  test("image resample really resamples: dims, PNG round-trip, content") {
    // solid mid-gray 64x48 PNG: any real resample to 16x12 must yield a
    // decodable image of exactly those dims whose pixels are still that
    // gray — a stub or geometry-only path can't fake all three
    val img = new java.awt.image.BufferedImage(
      64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 64) img.setRGB(x, y, 0x808080)
    val out = Multimodal.resampleImage(img, 16, 12).get
    assert((out(0) & 0xFF) === 0x89 && out(1) === 'P'.toByte, "PNG magic")
    val back = Multimodal.decodeImage(out).get
    assert(back.getWidth === 16 && back.getHeight === 12)
    assert((back.getRGB(8, 6) & 0xFFFFFF) === 0x808080, "gray preserved")
    // the 8-byte IHDR read agrees with the full decode
    assert(Multimodal.pngDims(out) === Some((16, 12)))
    assert(Multimodal.pngDims("not a png".getBytes("UTF-8")) === None)
    // deterministic bytes (the q_media_resample contract relies on it)
    assert(out.toSeq === Multimodal.resampleImage(img, 16, 12).get.toSeq)
  }

  test("resample operator: downscale, passthrough, and corrupt routing") {
    val media = Seq(
      (1L, "image", graft.operators.MediaContainers.bmp(64, 48, 7L)),
      (2L, "image", graft.operators.MediaContainers.bmp(10, 8, 7L)),
      (3L, "image", "not an image".getBytes("UTF-8")),
      (4L, "audio", "whatever".getBytes("UTF-8"))
    ).toDF("media_id", "kind", "bytes")
    val rs = Multimodal.resampleImages(media, maxDim = 16).collect()
      .map(r => r.media_id -> r).toMap
    // 64x48 -> 16x12, re-encoded
    assert(rs(1L).resized && rs(1L).out_width === 16 && rs(1L).out_height === 12)
    assert(Multimodal.decodeImage(rs(1L).bytes).exists(i =>
      i.getWidth === 16 && i.getHeight === 12))
    // already within maxDim: original bytes pass through untouched
    assert(!rs(2L).resized && rs(2L).out_width === 10 && rs(2L).out_height === 8)
    assert(rs(2L).bytes.toSeq ===
      graft.operators.MediaContainers.bmp(10, 8, 7L).toSeq)
    // corrupt image and non-image kinds: passthrough, zero dims, no throw
    assert(!rs(3L).resized && rs(3L).out_width === 0)
    assert(!rs(4L).resized && rs(4L).bytes.toSeq === "whatever".getBytes.toSeq)
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
