package graft

import org.apache.spark.sql.functions._
import graft.operators.{MediaContainers, Multimodal}

/** WAV/BMP/MP4 container synthesis + parsing: round trips, independent
  * encoders (JDK AudioSystem, python-wave checked-in fixture, ImageIO),
  * and corrupt-input safety for every prefix truncation. */
class MediaContainersSpec extends SparkSpec {
  import spark.implicits._

  test("WAV round trip recovers channels, rate, bits, and duration") {
    for ((ch, rate, n) <- Seq((1, 8000, 800), (2, 44100, 44100), (1, 16000, 0))) {
      val m = MediaContainers.parseWav(MediaContainers.wav(ch, rate, n, seed = 7))
      assert(m.isDefined, s"ch=$ch rate=$rate n=$n")
      assert(m.get.channels == ch && m.get.sampleRate == rate &&
        m.get.bitsPerSample == 16)
      assert(m.get.durationMs == n.toLong * 1000 / rate)
    }
  }

  test("parseWav reads the JDK's own AudioSystem WAV output") {
    import javax.sound.sampled._
    val fmt = new AudioFormat(22050f, 16, 2, true, false)
    val pcm = new Array[Byte](22050 * 2 * 2) // 1 second stereo
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 22050)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val m = MediaContainers.parseWav(bos.toByteArray)
    assert(m.isDefined, "must parse the JDK encoder's container")
    assert(m.get.channels == 2 && m.get.sampleRate == 22050 &&
      m.get.bitsPerSample == 16 && m.get.durationMs == 1000L)
  }

  test("parseWav reads the checked-in python-wave fixture") {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource("/sample.wav").toURI))
    val m = MediaContainers.parseWav(bytes)
    assert(m.isDefined, "must parse the python wave module's container")
    assert(m.get.channels == 2 && m.get.sampleRate == 11025 &&
      m.get.bitsPerSample == 16 && m.get.durationMs == 2000L)
  }

  test("parseWav rejects compressed RIFF payloads instead of lying") {
    // a valid PCM WAV whose fmt code is flipped to 2 (ADPCM): the PCM
    // duration formula would be confidently wrong, so the parse must be
    // None, not a plausible number
    val wav = MediaContainers.wav(1, 8000, 64, seed = 3)
    wav(20) = 2 // fmt chunk payload byte 0 (little-endian u16 format code)
    assert(MediaContainers.parseWav(wav).isEmpty)
  }

  test("parseWav rejects a lying byte-rate field instead of a wrong duration") {
    // valid PCM header whose declared byteRate is patched to 1: the PCM
    // layout fixes byteRate = rate * channels * bytes/sample, so a
    // disagreeing field is a corrupt header — duration from it would be
    // off by orders of magnitude
    val wav = MediaContainers.wav(1, 8000, 64, seed = 3)
    val b = java.nio.ByteBuffer.wrap(wav).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(28, 1) // fmt payload +8 = avg-bytes-per-sec
    assert(MediaContainers.parseWav(wav).isEmpty)
  }

  test("parseAvi rejects a frame count above Int.MaxValue, never wraps") {
    val bytes = MediaContainers.avi(16, 16, 40000L,
      Seq(Multimodal.jpegFrame(16, 16, 1L, 0)))
    // avih payload starts at 32 (RIFF 12 + LIST hdr 8 + 'hdrl' 4 +
    // chunk hdr 8); dwTotalFrames is payload +16
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(48, 0x80000000) // u32 2^31: .toInt would go negative
    assert(MediaContainers.parseAvi(bytes).isEmpty)
  }

  test("AVI round trip recovers dims, duration, and decodable frames") {
    val (w, h, n) = (32, 24, 5)
    val frames = (0 until n).map(i => Multimodal.jpegFrame(w, h, 42L, i))
    val bytes = MediaContainers.avi(w, h, usPerFrame = 40000L, frames)
    val m = MediaContainers.parseAvi(bytes)
    assert(m.contains(MediaContainers.AviMeta(w, h, 40L * n, n)))
    val ranges = MediaContainers.aviFrameRanges(bytes)
    assert(ranges.length == n)
    // every movi chunk is a complete JPEG the JDK decodes at exact dims
    ranges.foreach { case (o, l) =>
      val img = Multimodal.decodeImage(java.util.Arrays.copyOfRange(bytes, o, o + l))
      assert(img.exists(i => i.getWidth == w && i.getHeight == h))
    }
    // frame payloads survive byte-exactly (offset bookkeeping is right)
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(bytes, ranges(2)._1,
        ranges(2)._1 + ranges(2)._2), frames(2)))
  }

  test("DIB AVI round trip: codec, exact pixels, closed-form bands") {
    val (w, h, n) = (20, 12, 3)
    val stride = (3 * w + 3) / 4 * 4
    val frames = (0 until n).map(i => Multimodal.dibFrame(w, h, 7L, i))
    val bytes = MediaContainers.avi(w, h, 40000L, frames, "DIB ")
    assert(MediaContainers.parseAvi(bytes)
      .contains(MediaContainers.AviMeta(w, h, 40L * n, n, "DIB ")))
    val ranges = MediaContainers.aviFrameRanges(bytes)
    assert(ranges.length == n && ranges.forall(_._2 == stride * h))
    // decode of frame 1 recovers the exact formula pixels (lossless —
    // the property the JPEG path cannot have, and what makes the video
    // feature bands oracle-checkable)
    val img = Multimodal.dibToImage(bytes, ranges(1)._1, ranges(1)._2, w, h)
      .getOrElse(fail("DIB frame must decode"))
    for (x <- 0 until w; y <- 0 until h) {
      val v = ((7L + 17L * 1 + 7L * x + 13L * y) & 0xFF).toInt
      // generator writes row y at payload row y; bottom-up storage means
      // the IMAGE shows it at h-1-y — band means are x-only so callers
      // never care, but the pixel pin must account for the flip
      assert((img.getRGB(x, h - 1 - y) & 0xFF) == v, s"pixel $x,$y")
    }
    // a wrong-sized frame is rejected at write AND classified corrupt
    // at decode
    intercept[IllegalArgumentException] {
      MediaContainers.avi(w, h, 40000L, Seq(new Array[Byte](5)), "DIB ")
    }
    assert(Multimodal.dibToImage(bytes, ranges(0)._1, ranges(0)._2 - 1,
      w, h).isEmpty)
    // MJPEG stays the default and parses with its own codec fourcc
    assert(MediaContainers.parseAvi(MediaContainers.avi(16, 16, 40000L,
      Seq(Multimodal.jpegFrame(16, 16, 1L, 0)))).exists(_.codec == "MJPG"))
  }

  test("every AVI prefix truncation parses to None / no frames") {
    val bytes = MediaContainers.avi(16, 16, 40000L,
      Seq(Multimodal.jpegFrame(16, 16, 1L, 0)))
    for (len <- 0 until bytes.length) {
      assert(MediaContainers.parseAvi(bytes.take(len)).isEmpty, s"avi@$len")
      assert(MediaContainers.aviFrameRanges(bytes.take(len)).isEmpty, s"avi@$len")
    }
    assert(MediaContainers.parseAvi(null).isEmpty)
    assert(MediaContainers.aviFrameRanges(null).isEmpty)
    // crafted chunk size near Int.MaxValue: corrupt, never a wrap
    val b = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(56).put("AVI ".getBytes("US-ASCII"))
    b.put("LIST".getBytes("US-ASCII")).putInt(0x7FFFFFF8)
    assert(MediaContainers.parseAvi(b.array()).isEmpty)
    assert(MediaContainers.aviFrameRanges(b.array()).isEmpty)
  }

  test("MP4 round trip recovers dimensions and duration") {
    for ((w, h, d) <- Seq((640, 480, 12345L), (16, 16, 0L), (1920, 1080, 1L))) {
      val m = MediaContainers.parseMp4(MediaContainers.mp4(w, h, d))
      assert(m.isDefined, s"$w x $h")
      assert(m.get.width == w && m.get.height == h && m.get.durationMs == d)
    }
  }

  test("BMP synthesis decodes through ImageIO with exact dimensions") {
    val bytes = MediaContainers.bmp(37, 23, seed = 99)
    // closed-form size the oracle relies on
    assert(bytes.length == 54 + 23 * ((3 * 37 + 3) / 4 * 4))
    val img = Multimodal.decodeImage(bytes)
    assert(img.isDefined, "JDK ImageIO must read our BMP")
    val m = Multimodal.imageMeta(img.get)
    assert(m.width == 37 && m.height == 23 && m.channels == 3)
  }

  test("every prefix truncation parses to None, never throws") {
    val wav = MediaContainers.wav(2, 8000, 64, seed = 1)
    val mp4 = MediaContainers.mp4(320, 240, 5000L)
    for (len <- 0 until wav.length)
      assert(MediaContainers.parseWav(wav.take(len)).isEmpty, s"wav@$len")
    for (len <- 0 until mp4.length)
      assert(MediaContainers.parseMp4(mp4.take(len)).isEmpty, s"mp4@$len")
    assert(MediaContainers.parseWav(null).isEmpty)
    assert(MediaContainers.parseMp4(null).isEmpty)
    assert(MediaContainers.parseWav("RIFFgarbage".getBytes).isEmpty)
    assert(MediaContainers.parseMp4(Array.fill[Byte](64)(0x7F)).isEmpty)
  }

  test("crafted chunk sizes near Int.MaxValue parse to None, never wrap") {
    // valid RIFF/WAVE magic, then a chunk declaring ~2^31 bytes: the
    // walk must classify it corrupt, not wrap the cursor negative
    val b = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(56).put("WAVE".getBytes("US-ASCII"))
    b.put("junk".getBytes("US-ASCII")).putInt(0x7FFFFFF8)
    assert(MediaContainers.parseWav(b.array()).isEmpty)
    // same shape on the MP4 side: a box size that overruns the buffer
    val m = java.nio.ByteBuffer.allocate(32).order(java.nio.ByteOrder.BIG_ENDIAN)
    m.putInt(0x7FFFFFF0).put("moov".getBytes("US-ASCII"))
    assert(MediaContainers.parseMp4(m.array()).isEmpty)
  }

  test("synthesis rejects payloads that would overflow container fields") {
    intercept[IllegalArgumentException] {
      MediaContainers.wav(channels = 2, sampleRate = 44100,
        numSamples = 600000000, seed = 1) // 2.4 GB payload
    }
    intercept[IllegalArgumentException] {
      MediaContainers.mp4(640, 480, durationMs = 0x100000000L) // > u32
    }
    intercept[IllegalArgumentException] {
      MediaContainers.mp4(0x10000, 480, 0L) // 16.16 tkhd would truncate
    }
    intercept[IllegalArgumentException] {
      MediaContainers.avi(16, 16, usPerFrame = 0x100000000L,
        Seq(Array[Byte](1))) // > u32 frame period
    }
    intercept[IllegalArgumentException] {
      MediaContainers.avi(16, 16, 40000L, Seq.empty) // a video needs frames
    }
    // the u32 boundary itself is representable and round-trips
    val edge = MediaContainers.parseMp4(
      MediaContainers.mp4(640, 480, 0xFFFFFFFFL))
    assert(edge.exists(_.durationMs == 0xFFFFFFFFL))
  }

  test("audio features are the real PCM amplitude envelope") {
    // hand-built mono WAV: 400 silent samples then 400 full-scale ones —
    // a 2-band envelope must read ~[0, 1], which no byte-hash stub does
    val n = 800
    val b = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(n * 2)
    for (i <- 0 until n)
      b.putShort(if (i < n / 2) 0 else Short.MaxValue)
    val Some((meta, f)) = Multimodal.audioFeatures(b.array(), dim = 2)
    assert(meta.channels == 1 && meta.sampleRate == 8000)
    assert(f(0) == 0.0)
    assert(f(1) > 0.999 && f(1) <= 1.0, f.toSeq)
    // non-WAV bytes: None (stub path), never a throw
    assert(Multimodal.audioFeatures("not audio".getBytes, 2).isEmpty)
    // fixture WAVs route through the real path in-engine: channels is
    // populated from the container, not zeroed like the stub path
    val media = Multimodal.containerMediaFromDocuments(
      Tables.documents(spark, sf001))
    val audio = Multimodal.extractFeatures(media, dim = 4)
      .filter(_.kind == "audio").collect()
    assert(audio.nonEmpty)
    assert(audio.forall(m => m.channels == 1 || m.channels == 2))
    assert(audio.forall(_.features.forall(v => v >= 0.0 && v <= 1.0)))
  }

  test("parseMeta yields real per-kind metadata end-to-end on the fixture") {
    val parsed = Multimodal.parseMeta(
      Multimodal.containerMediaFromDocuments(Tables.documents(spark, sf001)))
      .collect()
    assert(parsed.nonEmpty)
    val byKind = parsed.groupBy(_.kind)
    assert(byKind.keySet == Set("image", "audio", "video"))
    // every image decoded (no fallback zeros), audio carries rate+channels,
    // video carries dims+duration
    assert(byKind("image").forall(m => m.width > 0 && m.height > 0 &&
      m.channels == 3 && m.sample_rate == 0))
    assert(byKind("audio").forall(m => m.sample_rate == 8000 &&
      (m.channels == 1 || m.channels == 2) && m.width == 0))
    assert(byKind("video").forall(m => m.width >= 16 && m.height >= 16 &&
      m.duration_ms > 0 && m.channels == 0))
    // video splits by id parity: even = AVI (real frame count from avih),
    // odd = MP4 (real sample count from the stsz walk) — both share the
    // 40 ms/frame convention
    val (avi, mp4) = byKind("video").partition(_.media_id % 2 == 0)
    assert(avi.nonEmpty && mp4.nonEmpty)
    assert(avi.forall(m => m.frames >= 2 && m.duration_ms == 40L * m.frames))
    assert(mp4.forall(m => m.frames >= 2 && m.frames <= 9 &&
      m.duration_ms == 40L * m.frames))
  }

  test("MP4 sample table round-trips extents and exact payload bytes") {
    val samples = Seq(
      Array.tabulate[Byte](13)(i => i.toByte),
      Array.tabulate[Byte](40)(i => (i * 3).toByte),
      Array.tabulate[Byte](8)(i => (0x40 + i).toByte))
    val bytes = MediaContainers.mp4WithSamples(320, 240, 40, samples)
    val meta = MediaContainers.parseMp4(bytes)
    assert(meta.contains(MediaContainers.Mp4Meta(320, 240, 120L, 3)))
    val ranges = MediaContainers.mp4SampleRanges(bytes)
    assert(ranges.map(_._2) == Vector(13, 40, 8))
    // contiguous single-chunk packing + the payload bytes themselves
    assert(ranges(1)._1 == ranges(0)._1 + 13 && ranges(2)._1 == ranges(1)._1 + 40)
    for (((off, len), s) <- ranges.zip(samples))
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, off, off + len), s))
    // the closed form the q_mp4_samples oracle hard-codes: first sample
    // at ftyp(20) + moov(555 + 4n) + mdat header(8) = 583 + 4n
    assert(ranges(0)._1 == 583 + 4 * samples.size,
      "MP4 box-tree layout drifted — update the q_mp4_samples oracle")
    // header-only blobs still parse, with a sample count of zero
    assert(MediaContainers.parseMp4(MediaContainers.mp4(320, 240, 5000L))
      .exists(_.numSamples == 0))
    assert(MediaContainers.mp4SampleRanges(
      MediaContainers.mp4(320, 240, 5000L)).isEmpty)
  }

  test("sampled MP4: every prefix truncation parses to None, never throws") {
    // moov precedes mdat, so a prefix can hold an intact box tree with a
    // truncated payload — the stco/stsz bounds check must classify it
    // corrupt (None / empty), not return extents past the buffer
    val full = MediaContainers.mp4WithSamples(64, 48, 40,
      Seq(Array.fill[Byte](24)(1), Array.fill[Byte](17)(2)))
    for (len <- 0 until full.length) {
      val p = full.take(len)
      assert(MediaContainers.parseMp4(p).isEmpty, s"sampled-mp4@$len")
      assert(MediaContainers.mp4SampleRanges(p).isEmpty, s"ranges@$len")
    }
    assert(MediaContainers.mp4SampleRanges(null).isEmpty)
    assert(MediaContainers.mp4SampleRanges(Array.fill[Byte](64)(0x7F)).isEmpty)
  }
}
