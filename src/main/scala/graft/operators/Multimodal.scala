package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata (SURVEY.md §2.7 / builder brief).
  *
  * The Spark-side machinery — schema, batched per-partition processing,
  * deterministic partitioning by media kind, output feature schema — is
  * real and tested. METADATA is REAL for all three kinds: `decodeImage`
  * runs the JDK's `javax.imageio` readers (PNG, JPEG, GIF, BMP, WBMP)
  * inside the per-partition boundary and yields true
  * width/height/channels plus pooled-luminance features off the actual
  * pixels; `parseMeta` additionally walks WAV/RIFF chunk headers and
  * MP4/ISO-BMFF box trees ([[MediaContainers]]) for audio/video
  * sample-rate/channels/dimensions/duration — pure JDK byte parsing, no
  * codec library. FEATURES are real for images (pixel luminance bands),
  * PCM-WAV audio (`audioFeatures`: amplitude-envelope bands off the
  * actual samples), and MJPEG-in-AVI video (`videoFeatures`: sampled
  * frames JPEG-decoded and band-pooled — AVI is RIFF and its frames are
  * plain JPEGs, both pure JDK). Only MP4 sample decode (needs a codec
  * this container doesn't ship) and corrupt blobs fall back to
  * `decodeStub`, which derives a deterministic fake feature vector with
  * the same signature and batch shape; swap it for a real decoder
  * (JNI/javacpp ffmpeg) without touching anything else.
  *
  * Scale notes: media blobs never pass through a shuffle — features are
  * extracted in the scan stage (mapPartitions, batched), and only the
  * small (id, meta, features) projection continues downstream. Partition
  * skew from large blobs is bounded by `maxRecordsPerBatch`-style
  * chunking in the iterator (the batch here is the iterator itself).
  * Decode cost is per-blob CPU inside the scan, embarrassingly parallel.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("codec", StringType))), nullable = true)))

  /** kind as a relational expression of doc_id — the single source of
    * truth for fixture routing. pmod (unlike %) is non-negative for
    * negative doc_ids, identical to the typed maps' floorMod dispatch,
    * so a relational filter on this column and the in-map `kind` match
    * can never disagree on a row. Both generators derive from here;
    * adding a fourth kind means editing exactly this expression and the
    * match arms it feeds. */
  private def kindCol: Column =
    element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int"))

  /** Deterministic synthetic media table derived from documents (fixture
    * generator: bytes = utf8(text), meta from n_chars). */
  def fakeMediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      kindCol.as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        (pmod(col("n_chars"), lit(640)) + 1).cast("int").as("width"),
        (pmod(col("n_chars"), lit(480)) + 1).cast("int").as("height"),
        (col("n_chars") * 10).as("duration_ms"),
        lit("stub").as("codec")).as("meta"))

  val AllKinds: Set[String] = Set("image", "audio", "video")

  /** Synthetic media table with REAL container bytes: BMP images, PCM
    * WAV audio, MJPEG-AVI / ISO-BMFF MP4 video ([[MediaContainers]]),
    * every header field a closed form of (doc_id, n_chars) so parse
    * results are oracle-predictable. Built in a typed map (byte assembly
    * is imperative); one narrow stage, no shuffle.
    *
    * `kinds` prunes synthesis itself: kind is derived as a RELATIONAL
    * column (`pmod(doc_id, 3)` — same mapping as the map's `floorMod`)
    * and filtered BEFORE the object boundary. A caller's post-map
    * `where(kind === ...)` cannot reach through the typed map, and since
    * the even-video rows encode real JPEG frames, synthesizing a blob
    * just to drop it is the expensive path — an image-only query must
    * never pay the AVI encoder. */
  def containerMediaFromDocuments(docs: DataFrame,
      kinds: Set[String] = AllKinds): DataFrame = {
    import docs.sparkSession.implicits._
    require(kinds.nonEmpty, "kinds must name at least one media kind")
    require(kinds.subsetOf(AllKinds),
      s"unknown media kinds: ${kinds -- AllKinds}")
    val withKind =
      docs.select(col("doc_id"), col("n_chars"), kindCol.as("kind"))
    val pruned = if (kinds == AllKinds) withKind
      else withKind.where(col("kind").isInCollection(kinds))
    pruned.as[(Long, Long, String)].map { case (id, nc, kind) =>
      // floorMod, not %: a negative doc_id/n_chars must still land in
      // the generators' valid ranges (Scala % keeps the dividend's
      // sign, so `id % 2 + 1` could be 0 and the wav/bmp require()
      // would kill the partition — against the module's contract).
      // Fixture ids are non-negative, so semantics there are identical.
      kind match {
        case "image" => (id, kind,
          MediaContainers.bmp((math.floorMod(nc, 64) + 1).toInt,
            (math.floorMod(nc, 48) + 1).toInt, id))
        case "audio" => (id, kind,
          MediaContainers.wav((math.floorMod(id, 2) + 1).toInt, 8000,
            math.floorMod(nc, 4096).toInt, id))
        case _ if math.floorMod(id, 2) == 0 =>
          // even video ids: AVI — the pure-JDK-decodable container.
          // id % 4 == 0 → MJPEG (real lossy JPEG frames: exercises the
          // ImageIO decode path; bands NOT closed-form), id % 4 == 2 →
          // uncompressed DIB frames (same pixel pattern, lossless:
          // bands ARE closed forms, oracle-checked end-to-end by
          // q_media_features_video). Small frames keep the generator
          // cheap in the scan stage; every header field stays a closed
          // form of (doc_id, n_chars) for the oracle:
          // duration = 40ms/frame * (nc % 8 + 2) frames.
          val w = (math.floorMod(nc, 64) + 16).toInt
          val h = (math.floorMod(nc, 48) + 16).toInt
          val nFrames = (math.floorMod(nc, 8) + 2).toInt
          if (math.floorMod(id, 4) == 0)
            (id, kind, MediaContainers.avi(w, h, 40000L,
              (0 until nFrames).map(i => jpegFrame(w, h, id, i))))
          else
            (id, kind, MediaContainers.avi(w, h, 40000L,
              (0 until nFrames).map(i => dibFrame(w, h, id, i)), "DIB "))
        case _ =>
          // odd video ids: ISO-BMFF/MP4 with a REAL stbl sample table
          // (stsd/stts/stsc/stsz/stco + mdat). Sample COUNT, per-sample
          // sizes, and byte offsets are closed forms of (doc_id,
          // n_chars) — oracle-checkable through the box walk — while
          // sample CONTENT is a deterministic fake bitstream (pixel
          // decode needs an external codec; that seam stays stubbed).
          // Same 40 ms/frame convention as the AVI rows, so both video
          // parities share one closed duration form: 40 * (nc % 8 + 2).
          val nSamples = (math.floorMod(nc, 8) + 2).toInt
          (id, kind, MediaContainers.mp4WithSamples(
            (math.floorMod(nc, 640) + 16).toInt,
            (math.floorMod(nc, 480) + 16).toInt,
            40,
            (0 until nSamples).map(i => mp4FakeSample(id, nc, i))))
      }
    }.toDF("media_id", "kind", "bytes")
  }

  /** Deterministic JPEG frame for the AVI fixture: flat-gradient gray
    * `(seed + 17*frame + 7x + 13y) & 0xFF` (the BMP generator's pattern
    * shifted per frame), encoded with the JDK's ImageIO JPEG writer into
    * a memory-backed stream (same no-tmpfile discipline as
    * [[resampleImage]]). JPEG is lossy, so frame PIXELS are not a closed
    * form — specs compare decode-of-encode; only header fields feed the
    * oracle. */
  private[graft] def jpegFrame(w: Int, h: Int, seed: Long,
      frame: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((seed + 17L * frame + 7L * x + 13L * y) & 0xFF).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    val ok = try javax.imageio.ImageIO.write(img, "jpeg", ios)
      finally scala.util.Try(ios.close())
    require(ok, "JDK JPEG writer SPI missing") // ships with every JDK
    bos.toByteArray
  }

  /** Deterministic fake MP4 sample payload: size `(nc + 17i) % 48 + 8`
    * bytes, byte j = `(id*31 + i*17 + j*7) & 0xFF`. Sizes are the
    * closed form the sample-table oracle recomputes; CONTENT only needs
    * determinism (it is not a decodable bitstream — the codec seam). */
  private[graft] def mp4FakeSample(id: Long, nc: Long,
      i: Int): Array[Byte] = {
    val size = (math.floorMod(nc + 17L * i, 48) + 8).toInt
    Array.tabulate[Byte](size)(j => ((id * 31 + i * 17 + j * 7) & 0xFF).toByte)
  }

  final case class ParsedMeta(media_id: Long, kind: String, width: Int,
      height: Int, channels: Int, sample_rate: Int, duration_ms: Long,
      frames: Int) // AVI frame / MP4 stbl sample count; 0 when absent

  /** REAL metadata for all three kinds, parsed from the container bytes
    * in the scan stage: ImageIO decode for images, RIFF chunk walk for
    * WAV, ISO-BMFF box walk for MP4. Kind-gated (no cross-format header
    * sniffing per blob in the hot loop); corrupt/undecodable blobs yield
    * a zeroed row, never a partition failure. Fields that a format does
    * not carry are 0 (e.g. audio has no width, image no duration). */
  def parseMeta(media: DataFrame): Dataset[ParsedMeta] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("kind"), col("bytes"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val id = r.getAs[Long]("media_id")
          val kind = r.getAs[String]("kind")
          val bytes = r.getAs[Array[Byte]]("bytes")
          kind match {
            case "image" => decodeImage(bytes) match {
              case Some(img) =>
                val m = imageMeta(img)
                ParsedMeta(id, kind, m.width, m.height, m.channels, 0, 0L, 0)
              case None => ParsedMeta(id, kind, 0, 0, 0, 0, 0L, 0)
            }
            case "audio" => MediaContainers.parseWav(bytes) match {
              case Some(w) =>
                ParsedMeta(id, kind, 0, 0, w.channels, w.sampleRate,
                  w.durationMs, 0)
              case None => ParsedMeta(id, kind, 0, 0, 0, 0, 0L, 0)
            }
            case "video" if isRiff(bytes) => // AVI — the other video
              // container is ISO-BMFF; a 4-byte magic check routes them
              MediaContainers.parseAvi(bytes) match {
                case Some(a) =>
                  ParsedMeta(id, kind, a.width, a.height, 0, 0,
                    a.durationMs, a.numFrames)
                case None => ParsedMeta(id, kind, 0, 0, 0, 0, 0L, 0)
              }
            case "video" => MediaContainers.parseMp4(bytes) match {
              case Some(v) =>
                ParsedMeta(id, kind, v.width, v.height, 0, 0, v.durationMs,
                  v.numSamples) // parsed from the stbl walk, not synthesized
              case None => ParsedMeta(id, kind, 0, 0, 0, 0, 0L, 0)
            }
            case _ => ParsedMeta(id, kind, 0, 0, 0, 0, 0L, 0)
          }
        }
      }
  }

  final case class MediaFeatures(media_id: Long, kind: String,
      n_bytes: Long, features: Array[Double],
      width: Int, height: Int, channels: Int) // 0/0/0 on the stub path

  final case class ImageMeta(width: Int, height: Int, channels: Int)

  /** REAL image decode via the JDK's `javax.imageio` (PNG, JPEG, GIF,
    * BMP, WBMP readers ship with the JDK — no external codec). None when
    * the bytes are not a decodable image; a truncated/corrupt blob must
    * select the fallback path, never kill the partition.
    *
    * The bytes are already on-heap, so the reader is fed an explicit
    * memory-backed ImageInputStream: `ImageIO.read(InputStream)` would
    * otherwise spill a FileCacheImageInputStream temp file to
    * java.io.tmpdir PER BLOB (a disk write in the scan stage, and a
    * decode that spuriously fails — stubbing real images — wherever
    * tmpdir is unwritable on an executor). */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (bytes == null || bytes.isEmpty) None
    else scala.util.Try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      // ImageIO.read(ImageInputStream) closes the stream itself on the
      // decode path (but NOT on the no-reader-found null path) — the
      // defensive close must swallow the double-close IOException or a
      // successful decode is thrown away from inside the finally.
      try Option(javax.imageio.ImageIO.read(iis))
      finally scala.util.Try(iis.close())
    }.toOption.flatten

  def imageMeta(img: java.awt.image.BufferedImage): ImageMeta =
    ImageMeta(img.getWidth, img.getHeight,
      img.getColorModel.getNumComponents)

  /** Features off REAL pixels: `dim` evenly-spaced vertical bands,
    * mean Rec.709 relative luminance per band, each in [0,1]. A real
    * vision pipeline would feed an embedding model here; band-pooled
    * luminance keeps the contract (fixed-dim, [0,1], deterministic)
    * while exercising a genuine decode of every pixel. */
  def imageFeatures(img: java.awt.image.BufferedImage, dim: Int): Array[Double] = {
    val out = new Array[Double](dim)
    val cnt = new Array[Long](dim)
    val (w, h) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (0.2126 * ((rgb >> 16) & 0xFF) + 0.7152 * ((rgb >> 8) & 0xFF) +
          0.0722 * (rgb & 0xFF)) / 255.0
        val d = math.min(dim - 1, x * dim / w)
        out(d) += lum
        cnt(d) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < dim) { if (cnt(i) > 0) out(i) /= cnt(i); i += 1 }
    out
  }

  /** REAL audio features off PCM samples: `dim` evenly-spaced time
    * bands, mean absolute 16-bit amplitude per band normalized to [0,1]
    * — the audio analogue of [[imageFeatures]]'s band-pooled luminance
    * (a real pipeline would feed a speech/audio embedding model here;
    * amplitude envelope keeps the contract while decoding every actual
    * sample). Pure byte parsing via [[MediaContainers.parseWav]]'s data
    * chunk — no codec library. None for non-WAV / non-16-bit blobs. */
  def audioFeatures(bytes: Array[Byte], dim: Int)
      : Option[(MediaContainers.WavMeta, Array[Double])] =
    MediaContainers.parseWav(bytes)
      .filter(m => m.bitsPerSample == 16 && m.dataOffset >= 0)
      .map { m =>
        // Integer-only inner loop: abs amplitudes accumulate in a Long
        // (≤ 2^15 per sample × dataLen/2 samples ≪ 2^53, so the one
        // closing division is exactly rounded) — no per-sample FP work.
        val sum = new Array[Long](dim)
        val cnt = new Array[Long](dim)
        val n = m.dataLen / 2
        var i = 0
        while (i < n) {
          val o = m.dataOffset + i * 2
          val s = ((bytes(o) & 0xFF) | (bytes(o + 1) << 8)).toShort
          val d = math.min(dim - 1, (i.toLong * dim / n).toInt)
          sum(d) += math.abs(s.toInt)
          cnt(d) += 1
          i += 1
        }
        val out = new Array[Double](dim)
        var j = 0
        while (j < dim) { if (cnt(j) > 0) out(j) = sum(j) / (cnt(j) * 32768.0); j += 1 }
        (m, out)
      }

  private[operators] def isRiff(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F'

  /** Evenly-spaced frame indices — the scalar mirror of [[frameOffsets]]'
    * floor(i*n/k) HOF math applied to a frame COUNT instead of a byte
    * length (MultimodalSpec pins the two equal), deduplicated because
    * decoding the same frame twice buys nothing. */
  def sampleFrameIndices(numFrames: Int, k: Int): Seq[Int] =
    if (numFrames <= 0 || k <= 0) Seq.empty
    else (0 until k).map(i => i.toLong * numFrames / k)
      .map(_.toInt).distinct

  /** REAL video features for MJPEG-in-AVI: sample up to `maxFrames`
    * evenly-spaced frames from the `movi` chunk list, decode each JPEG
    * with [[decodeImage]], pool [[imageFeatures]] per frame, and average
    * across the sampled frames — actual pixels of actual video samples,
    * pure JDK. None when the blob is not a parseable AVI or no sampled
    * frame decodes (→ the stub path, same corrupt-safe contract as every
    * other decode here). Returns (header meta, decoded channels,
    * features). */
  def videoFeatures(bytes: Array[Byte], dim: Int, maxFrames: Int = 4)
      : Option[(MediaContainers.AviMeta, Int, Array[Double])] =
    MediaContainers.parseAvi(bytes).flatMap { meta =>
      val ranges = MediaContainers.aviFrameRanges(bytes)
      val decoded = sampleFrameIndices(ranges.length, maxFrames).flatMap { i =>
        val (o, l) = ranges(i)
        if (meta.codec == "DIB ") // headerless pixel rows, no ImageIO
          dibToImage(bytes, o, l, meta.width, meta.height)
        else decodeImage(java.util.Arrays.copyOfRange(bytes, o, o + l))
      }
      if (decoded.isEmpty) None
      else {
        val acc = new Array[Double](dim)
        decoded.foreach { img =>
          val f = imageFeatures(img, dim)
          var j = 0
          while (j < dim) { acc(j) += f(j); j += 1 }
        }
        var j = 0
        while (j < dim) { acc(j) /= decoded.size; j += 1 }
        Some((meta, decoded.head.getColorModel.getNumComponents, acc))
      }
    }

  /** Closed-form uncompressed-DIB AVI frame payload: bottom-up BGR rows
    * padded to 4 bytes (the in-AVI twin of [[MediaContainers.bmp]]'s
    * pixel block), gray value `(seed + 17*frame + 7x + 13y) & 0xFF` —
    * the SAME pattern [[jpegFrame]] encodes, but lossless, so every
    * derived feature band is exactly predictable by an oracle. */
  private[graft] def dibFrame(w: Int, h: Int, seed: Long,
      frame: Int): Array[Byte] = {
    val stride = (3 * w + 3) / 4 * 4
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((seed + 17L * frame + 7L * x + 13L * y) & 0xFF).toByte
        val p = y * stride + 3 * x
        out(p) = v; out(p + 1) = v; out(p + 2) = v // B G R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode a headerless bottom-up 24-bit DIB frame slice into a
    * BufferedImage. None unless the slice length is exactly
    * stride*height — a wrong-sized payload would decode to garbage
    * pixels (the plausible-lie class every parser here rejects). */
  private[graft] def dibToImage(bytes: Array[Byte], off: Int, len: Int,
      w: Int, h: Int): Option[java.awt.image.BufferedImage] = {
    if (w <= 0 || h <= 0) return None
    val stride = (3 * w + 3) / 4 * 4
    if (len != stride * h || off < 0 || off + len > bytes.length) return None
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      val row = off + y * stride // bottom-up: payload row y = image row h-1-y
      var x = 0
      while (x < w) {
        val p = row + 3 * x
        val b = bytes(p) & 0xFF
        val g = bytes(p + 1) & 0xFF
        val r = bytes(p + 2) & 0xFF
        img.setRGB(x, h - 1 - y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    Some(img)
  }

  /** STUB decoder: a real implementation would decode the codec and
    * pool pixel/sample statistics; this derives `dim` deterministic
    * pseudo-features by hashing byte chunks, preserving the exact
    * signature and batch shape a real decoder would have. */
  private[operators] def decodeStub(bytes: Array[Byte], dim: Int): Array[Double] = {
    val out = new Array[Double](dim)
    if (bytes == null || bytes.isEmpty) return out
    var i = 0
    while (i < bytes.length) {
      val d = i % dim
      out(d) += (bytes(i) & 0xFF) / 255.0
      i += 1
    }
    val chunks = math.ceil(bytes.length.toDouble / dim)
    out.map(v => v / chunks)
  }

  /** Batched per-partition feature extraction over the binary column —
    * the Scala analogue of a Pandas mapInPandas decode UDF. Image-kind
    * blobs that decode take the REAL pixel path (true dimensions +
    * pooled-luminance features); audio-kind blobs that parse as 16-bit
    * PCM WAV take the REAL sample path (amplitude-envelope bands +
    * channel count); everything else — video (MP4 sample decode needs a
    * codec this container doesn't ship) and corrupt blobs — takes the
    * stub path with zeroed dimensions, so the three are distinguishable
    * downstream. Decode attempts are gated on `kind`: no blob pays a
    * wrong-format sniff in the scan stage's hot loop. */
  def extractFeatures(media: DataFrame, dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("kind"), col("bytes"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val id = r.getAs[Long]("media_id")
          val kind = r.getAs[String]("kind")
          val bytes = r.getAs[Array[Byte]]("bytes")
          val nBytes = if (bytes == null) 0L else bytes.length.toLong
          def stub = MediaFeatures(id, kind, nBytes, decodeStub(bytes, dim), 0, 0, 0)
          kind match {
            case "image" => decodeImage(bytes) match {
              case Some(img) =>
                val m = imageMeta(img)
                MediaFeatures(id, kind, nBytes, imageFeatures(img, dim),
                  m.width, m.height, m.channels)
              case None => stub
            }
            case "audio" => audioFeatures(bytes, dim) match {
              case Some((m, f)) => MediaFeatures(id, kind, nBytes, f, 0, 0, m.channels)
              case None => stub
            }
            case "video" if isRiff(bytes) => videoFeatures(bytes, dim) match {
              // MJPEG-in-AVI: REAL per-frame pixel decode, pure JDK
              case Some((m, ch, f)) =>
                MediaFeatures(id, kind, nBytes, f, m.width, m.height, ch)
              case None => stub
            }
            case _ => stub // MP4 sample decode stays behind the codec seam
          }
        }
      }
  }

  final case class Mp4Sample(media_id: Long, sample_idx: Int,
      byte_off: Long, n_bytes: Long)

  /** Parsed per-sample byte extents of MP4 blobs via the real
    * stsz/stsc/stco walk ([[MediaContainers.mp4SampleRanges]]) — the
    * structural half of video sample extraction (payload DECODE needs an
    * external codec and stays behind the seam). Scan-stage
    * mapPartitions; a blob that is not a walkable ISO-BMFF contributes
    * no rows — same corrupt-safe contract as [[parseMeta]]. */
  def mp4Samples(media: DataFrame): Dataset[Mp4Sample] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("bytes"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.flatMap { r =>
          val id = r.getAs[Long]("media_id")
          val bytes = r.getAs[Array[Byte]]("bytes")
          MediaContainers.mp4SampleRanges(bytes).iterator.zipWithIndex.map {
            case ((off, len), i) => Mp4Sample(id, i, off.toLong, len.toLong)
          }
        }
      }
  }

  /** Deterministic frame sampling: n evenly-spaced offsets into the blob
    * (stands in for video frame extraction; row-local HOF). */
  def frameOffsets(bytesCol: org.apache.spark.sql.Column, n: Int)
      : org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => floor((i * greatest(length(bytesCol).cast("long"), lit(1L)))
        .cast("double") / n).cast("long"))

  /** Aspect-preserving resize target: scale (width, height) so the longer
    * side equals `maxDim`, never upscaling. This is the REAL half of an
    * image resize — the dimension math is pure Catalyst arithmetic over
    * the meta struct; only the pixel resampling itself belongs behind the
    * codec boundary ([[decodeStub]]'s slot). Returns a struct
    * (width, height). Integer floor semantics, min dimension 1. */
  def resizeTarget(metaCol: org.apache.spark.sql.Column, maxDim: Int)
      : org.apache.spark.sql.Column = {
    val w = metaCol.getField("width").cast("double")
    val h = metaCol.getField("height").cast("double")
    val scale = least(lit(1.0), lit(maxDim.toDouble) / greatest(w, h))
    struct(
      greatest(floor(w * scale), lit(1.0)).cast("int").as("width"),
      greatest(floor(h * scale), lit(1.0)).cast("int").as("height"))
  }

  /** Scalar mirror of [[resizeTarget]]'s Catalyst math, for use inside
    * the per-partition decode boundary (same double-scale/floor/min-1
    * semantics — MultimodalSpec pins the two implementations equal). */
  def resizeTargetDims(w: Int, h: Int, maxDim: Int): (Int, Int) = {
    val scale = math.min(1.0, maxDim.toDouble / math.max(w, h).toDouble)
    (math.max(1, math.floor(w * scale).toInt),
      math.max(1, math.floor(h * scale).toInt))
  }

  /** REAL pixel resample via the JDK's Graphics2D (bilinear), re-encoded
    * as PNG with the JDK's ImageIO writer — no codec library. The target
    * buffer is TYPE_3BYTE_BGR so the encode is deterministic regardless
    * of the source color model. None if the encode throws or no PNG
    * writer SPI is present (ImageIO.write returns false) — callers route
    * to passthrough, never a partition failure.
    *
    * The writer is fed a memory-backed ImageOutputStream explicitly:
    * `ImageIO.write(_, _, OutputStream)` would wrap the stream in a
    * FileCacheImageOutputStream and spill a java.io.tmpdir temp file
    * PER BLOB in the scan stage — the same trap [[decodeImage]]
    * documents and avoids on the read side. */
  def resampleImage(img: java.awt.image.BufferedImage,
      outW: Int, outH: Int): Option[Array[Byte]] =
    scala.util.Try {
      val dst = new java.awt.image.BufferedImage(
        outW, outH, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, outW, outH, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      // close() flushes the cache into bos; swallow a double-close like
      // the decode path
      val ok = try javax.imageio.ImageIO.write(dst, "png", ios)
        finally scala.util.Try(ios.close())
      if (ok) Some(bos.toByteArray) else None
    }.toOption.flatten

  /** Width/height straight from a PNG's IHDR header (signature + first
    * chunk are at fixed offsets) — lets [[resampleImages]] report the
    * geometry MEASURED from the bytes it actually emitted, at the cost
    * of an 8-byte read instead of a full decode. */
  private[graft] def pngDims(b: Array[Byte]): Option[(Int, Int)] = {
    def be(o: Int) = ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) |
      ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)
    if (b == null || b.length < 24 || (b(0) & 0xFF) != 0x89 ||
        b(1) != 'P' || b(2) != 'N' || b(3) != 'G' ||
        b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') None
    else Some((be(16), be(20)))
  }

  final case class ResizedMedia(media_id: Long, kind: String,
      in_width: Int, in_height: Int, out_width: Int, out_height: Int,
      bytes: Array[Byte], resized: Boolean)

  /** REAL image-resize stage: image-kind blobs that decode are
    * downscaled to [[resizeTarget]]'s aspect-preserving dims with a
    * genuine bilinear resample of the actual pixels and re-encoded as
    * PNG; blobs already within `maxDim` pass their original bytes
    * through untouched (no wasted re-encode in the scan stage).
    * Non-image kinds and corrupt blobs pass through with zeroed dims,
    * never a partition failure. Same scale shape as [[extractFeatures]]:
    * kind-gated decode inside the scan, no shuffle, blob-local CPU. */
  def resampleImages(media: DataFrame, maxDim: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("kind"), col("bytes"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val id = r.getAs[Long]("media_id")
          val kind = r.getAs[String]("kind")
          val bytes = r.getAs[Array[Byte]]("bytes")
          def passthrough(w: Int, h: Int) =
            ResizedMedia(id, kind, w, h, w, h, bytes, resized = false)
          if (kind != "image") passthrough(0, 0)
          else decodeImage(bytes) match {
            case Some(img) =>
              val (w, h) = (img.getWidth, img.getHeight)
              val (ow, oh) = resizeTargetDims(w, h, maxDim)
              if (ow == w && oh == h) passthrough(w, h)
              else {
                // out dims are MEASURED from the emitted PNG's header,
                // not echoed from the target math — a broken resample
                // surfaces in the row (and its oracle), not just specs
                val resampled = for {
                  out <- resampleImage(img, ow, oh)
                  dims <- pngDims(out)
                } yield ResizedMedia(id, kind, w, h, dims._1, dims._2,
                  out, resized = true)
                resampled.getOrElse(passthrough(w, h)) // encode failed
              }
            case None => passthrough(0, 0)
          }
        }
      }
  }
}
