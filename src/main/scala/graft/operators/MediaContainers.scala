package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Byte-level media container synthesis + parsing, pure JDK — no codec
  * libraries (the reference treats media as opaque blobs; SURVEY.md §2.7
  * asks for typed metadata over them). Three formats, chosen because
  * every one has a fully-specified header parseable/writable in plain
  * bytes:
  *
  *  - WAV/RIFF (audio): canonical PCM chunk layout — `fmt ` carries
  *    channels/sample-rate/bits, `data` carries the payload whose length
  *    determines duration.
  *  - BMP (image): uncompressed 24-bit BITMAPINFOHEADER — byte size is a
  *    closed form of (w, h), and the JDK's ImageIO ships a BMP reader,
  *    so [[Multimodal.decodeImage]] cross-validates the synthesis.
  *  - MP4/ISO-BMFF (video): box tree `ftyp` + `moov(mvhd, trak(tkhd))` —
  *    `mvhd` carries timescale/duration, `tkhd` carries 16.16
  *    fixed-point display dimensions.
  *
  * Parsers are CORRUPT-SAFE: every read is bounds-checked and any
  * malformed input yields None — a truncated blob in a 100 TB scan must
  * select the fallback row, never kill the partition (same contract as
  * [[Multimodal.decodeImage]]).
  */
object MediaContainers {

  /** `dataOffset`/`dataLen` locate the PCM payload inside the blob so
    * sample-level feature extraction needs no second chunk walk;
    * dataOffset is -1 when the data chunk was absent. */
  final case class WavMeta(channels: Int, sampleRate: Int,
      bitsPerSample: Int, durationMs: Long,
      dataOffset: Int = -1, dataLen: Int = 0)

  /** `numSamples` is the stsz sample count when the blob carries a real
    * `stbl` sample table; 0 for header-only blobs (no track samples). */
  final case class Mp4Meta(width: Int, height: Int, durationMs: Long,
      numSamples: Int = 0)

  /** `codec` is the strh fccHandler ("MJPG", "DIB " for uncompressed
    * device-independent-bitmap frames); "" when the header carries no
    * stream list. */
  final case class AviMeta(width: Int, height: Int, durationMs: Long,
      numFrames: Int, codec: String = "MJPG")

  // ---- synthesis ----------------------------------------------------

  /** Canonical 44-byte-header PCM WAV: 16-bit little-endian samples,
    * deterministic content from `seed`. */
  def wav(channels: Int, sampleRate: Int, numSamples: Int,
      seed: Long): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && numSamples >= 0)
    require(numSamples.toLong * channels * 2 <= Int.MaxValue - 44L,
      s"payload overflows a RIFF u32: $numSamples samples x $channels ch")
    val dataLen = numSamples * channels * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < numSamples * channels) {
      buf.putShort(((seed * 31 + i * 131) & 0x7FFF).toShort)
      i += 1
    }
    buf.array()
  }

  /** Uncompressed 24-bit BMP (BITMAPINFOHEADER, bottom-up rows padded to
    * 4 bytes): total size = 54 + h * ((3w + 3) / 4 * 4) — a closed form
    * the oracle can compute. Pixel content deterministic from `seed`. */
  def bmp(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0)
    val stride = (3 * width + 3) / 4 * 4
    val imageSize = stride * height
    val buf = ByteBuffer.allocate(54 + imageSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(54 + imageSize).putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24)
      .putInt(0) // BI_RGB
      .putInt(imageSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = ((seed + x * 7 + y * 13) & 0xFF).toByte
        buf.put(v).put(v).put(v) // B G R
        x += 1
      }
      var p = 3 * width
      while (p < stride) { buf.put(0.toByte); p += 1 }
      y += 1
    }
    buf.array()
  }

  /** Minimal ISO-BMFF: ftyp + moov(mvhd version 0, trak(tkhd version 0)).
    * Timescale 1000, so mvhd duration units ARE milliseconds; tkhd
    * width/height are 16.16 fixed point. Header-only — no sample table;
    * [[mp4WithSamples]] is the full-track form. */
  def mp4(width: Int, height: Int, durationMs: Long): Array[Byte] = {
    require(width > 0 && height > 0 && durationMs >= 0)
    // version-0 boxes carry u32 durations; a silent 32-bit truncation
    // would round-trip to a WRONG value, so reject instead
    require(durationMs <= 0xFFFFFFFFL,
      s"durationMs $durationMs exceeds a version-0 u32 box field")
    // tkhd dimensions are 16.16 fixed point: `width << 16` silently drops
    // bits above 0xFFFF and would round-trip to a wrong value — same
    // silent-truncation class the duration require rejects
    require(width <= 0xFFFF && height <= 0xFFFF,
      s"dimensions ${width}x$height exceed a tkhd 16.16 fixed-point field")
    ftypBytes ++ box("moov",
      mvhdBox(durationMs) ++ box("trak", tkhdBox(width, height, durationMs)))
  }

  /** Full-track ISO-BMFF: [[mp4]]'s header plus a real sample table —
    * `trak(tkhd, mdia(mdhd, hdlr, minf(vmhd, dinf(dref), stbl(stsd,
    * stts, stsc, stsz, stco))))` and an `mdat` carrying the sample
    * payloads in one chunk. `stts` declares a uniform `deltaMs` per
    * sample (timescale 1000), `stsz` the per-sample byte sizes, `stco`
    * the single chunk's absolute file offset — so [[mp4SampleRanges]]
    * can recover every sample's exact byte extent from the box tree
    * alone, no codec. Payload CONTENT is whatever the caller passes
    * (real codecs need external libraries; deterministic fake samples
    * keep offsets/sizes oracle-checkable).
    */
  def mp4WithSamples(width: Int, height: Int, deltaMs: Int,
      samples: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && samples.nonEmpty && deltaMs > 0)
    require(width <= 0xFFFF && height <= 0xFFFF,
      s"dimensions ${width}x$height exceed a tkhd 16.16 fixed-point field")
    val n = samples.size
    val durationMs = deltaMs.toLong * n
    require(durationMs <= 0xFFFFFFFFL,
      s"durationMs $durationMs exceeds a version-0 u32 box field")
    val totalSampleBytes = samples.iterator.map(_.length.toLong).sum
    require(totalSampleBytes <= Int.MaxValue - 4096L,
      s"mdat payload $totalSampleBytes overflows a u32 box size")

    def fullBox(kind: String, verFlags: Int, payload: Array[Byte]) = {
      val b = ByteBuffer.allocate(12 + payload.length)
        .order(ByteOrder.BIG_ENDIAN)
      b.putInt(12 + payload.length).put(kind.getBytes("US-ASCII"))
        .putInt(verFlags).put(payload)
      b.array()
    }
    // moov size does not depend on the chunk offset, so build twice:
    // pass 1 with offset 0 sizes the tree, pass 2 writes the real one.
    def buildMoov(chunkOffset: Long): Array[Byte] = {
      val mdhd = ByteBuffer.allocate(20).order(ByteOrder.BIG_ENDIAN)
      mdhd.putInt(0).putInt(0)      // creation, modification
        .putInt(1000)               // timescale: ms
        .putInt(durationMs.toInt)
        .putShort(0x55C4.toShort)   // language 'und'
        .putShort(0)                // pre_defined
      val hdlr = ByteBuffer.allocate(21).order(ByteOrder.BIG_ENDIAN)
      hdlr.putInt(0)                                 // pre_defined
        .put("vide".getBytes("US-ASCII"))            // handler type
        .putInt(0).putInt(0).putInt(0)               // reserved
        .put(0.toByte)                               // empty name
      val vmhd = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
      vmhd.putShort(0)                               // graphicsmode copy
        .putShort(0).putShort(0).putShort(0)         // opcolor
      val url = ByteBuffer.allocate(12).order(ByteOrder.BIG_ENDIAN)
      url.putInt(12).put("url ".getBytes("US-ASCII"))
        .putInt(1)                  // flag: media in same file
      val dref = fullBox("dref", 0, ByteBuffer.allocate(4)
        .order(ByteOrder.BIG_ENDIAN).putInt(1).array() ++ url.array())
      val dinf = box("dinf", dref)
      // VisualSampleEntry 'mp4v' (86 bytes): no codec config child —
      // the payloads are caller-defined bytes, not a real bitstream
      val entry = ByteBuffer.allocate(86).order(ByteOrder.BIG_ENDIAN)
      entry.putInt(86).put("mp4v".getBytes("US-ASCII"))
        .putInt(0).putShort(0)      // 6 reserved bytes
        .putShort(1)                // data_reference_index
        .putShort(0).putShort(0)    // pre_defined, reserved
        .putInt(0).putInt(0).putInt(0) // pre_defined[3]
        .putShort(width.toShort).putShort(height.toShort)
        .putInt(0x00480000).putInt(0x00480000) // 72 dpi
        .putInt(0)                  // reserved
        .putShort(1)                // frame_count per sample
      entry.position(entry.position() + 32) // compressorname: 32 zeroes
      entry.putShort(24)            // depth
        .putShort(-1)               // pre_defined
      val stsd = fullBox("stsd", 0, ByteBuffer.allocate(4)
        .order(ByteOrder.BIG_ENDIAN).putInt(1).array() ++ entry.array())
      val stts = fullBox("stts", 0, ByteBuffer.allocate(12)
        .order(ByteOrder.BIG_ENDIAN)
        .putInt(1).putInt(n).putInt(deltaMs).array())
      val stsc = fullBox("stsc", 0, ByteBuffer.allocate(16)
        .order(ByteOrder.BIG_ENDIAN)
        .putInt(1)                  // one entry:
        .putInt(1).putInt(n).putInt(1) // chunk 1 holds all n samples
        .array())
      val stszPayload = ByteBuffer.allocate(8 + 4 * n)
        .order(ByteOrder.BIG_ENDIAN)
      stszPayload.putInt(0)         // sample_size 0 = per-sample table
        .putInt(n)
      samples.foreach(sm => stszPayload.putInt(sm.length))
      val stsz = fullBox("stsz", 0, stszPayload.array())
      require(chunkOffset <= 0xFFFFFFFFL, "stco offset exceeds u32")
      val stco = fullBox("stco", 0, ByteBuffer.allocate(8)
        .order(ByteOrder.BIG_ENDIAN)
        .putInt(1).putInt(chunkOffset.toInt).array())
      val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
      val minf = box("minf",
        fullBox("vmhd", 0x000001, vmhd.array()) ++ dinf ++ stbl)
      val mdia = box("mdia",
        fullBox("mdhd", 0, mdhd.array()) ++
        fullBox("hdlr", 0, hdlr.array()) ++ minf)
      box("moov", mvhdBox(durationMs) ++
        box("trak", tkhdBox(width, height, durationMs) ++ mdia))
    }
    val moovLen = buildMoov(0L).length
    val firstSampleOffset = ftypBytes.length.toLong + moovLen + 8
    val moov = buildMoov(firstSampleOffset)
    val mdat = ByteBuffer.allocate(8 + totalSampleBytes.toInt)
      .order(ByteOrder.BIG_ENDIAN)
    mdat.putInt(8 + totalSampleBytes.toInt).put("mdat".getBytes("US-ASCII"))
    samples.foreach(mdat.put)
    ftypBytes ++ moov ++ mdat.array()
  }

  private def tkhdBox(width: Int, height: Int,
      durationMs: Long): Array[Byte] = {
    val tkhd = ByteBuffer.allocate(92).order(ByteOrder.BIG_ENDIAN)
    tkhd.putInt(92).put("tkhd".getBytes("US-ASCII"))
      .putInt(0x000007) // version 0, flags: enabled|in-movie|in-preview
      .putInt(0).putInt(0) // creation, modification
      .putInt(1)           // track id
      .putInt(0)           // reserved
      .putInt(durationMs.toInt)
      .putLong(0)          // reserved
      .putShort(0).putShort(0).putShort(0).putShort(0) // layer/alt/vol/res
    putIdentityMatrix(tkhd)
    tkhd.putInt(width << 16).putInt(height << 16)
    tkhd.array()
  }

  private def mvhdBox(durationMs: Long): Array[Byte] = {
    val mvhd = ByteBuffer.allocate(108).order(ByteOrder.BIG_ENDIAN)
    mvhd.putInt(108).put("mvhd".getBytes("US-ASCII"))
      .putInt(0)           // version 0, no flags
      .putInt(0).putInt(0) // creation, modification
      .putInt(1000)        // timescale: ms
      .putInt(durationMs.toInt)
      .putInt(0x00010000)  // rate 1.0
      .putShort(0x0100.toShort).putShort(0) // volume 1.0, reserved
      .putLong(0)          // reserved
    putIdentityMatrix(mvhd)
    mvhd.putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0) // predefined
    mvhd.putInt(2)         // next track id
    mvhd.array()
  }

  private val ftypBytes: Array[Byte] = {
    val ftyp = ByteBuffer.allocate(20).order(ByteOrder.BIG_ENDIAN)
    ftyp.putInt(20).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0)
      .put("isom".getBytes("US-ASCII"))
    ftyp.array()
  }

  /** Minimal MJPEG-in-AVI (RIFF, all little-endian):
    * `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
    * '00dc'...))`. AVI is the one VIDEO container whose frames the JDK
    * can decode without an external codec — each `00dc` chunk is a plain
    * JPEG, so [[Multimodal.decodeImage]] handles the samples and the
    * RIFF walk here handles the structure. `frames` are pre-encoded
    * JPEG payloads (encoding lives with ImageIO in Multimodal; this
    * module stays pure byte assembly). `usPerFrame` is the avih/strh
    * frame period in microseconds; duration = usPerFrame * frames. */
  def avi(width: Int, height: Int, usPerFrame: Long,
      frames: Seq[Array[Byte]], codec: String = "MJPG"): Array[Byte] = {
    require(width > 0 && height > 0 && frames.nonEmpty)
    require(usPerFrame > 0 && usPerFrame <= 0xFFFFFFFFL,
      s"usPerFrame $usPerFrame exceeds an avih u32 field")
    require(codec == "MJPG" || codec == "DIB ",
      s"unsupported AVI codec fourcc '$codec'")
    // DIB payloads are headerless pixel rows with a fixed closed-form
    // size — a wrong-sized frame would decode to garbage pixels, the
    // plausible-lie class every parser here rejects; reject at write too
    if (codec == "DIB ") {
      val expect = (3 * width + 3) / 4 * 4 * height
      require(frames.forall(_.length == expect),
        s"DIB frames must be exactly stride*height = $expect bytes")
    }
    val le = ByteOrder.LITTLE_ENDIAN
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      // RIFF chunks are even-padded; the declared size excludes the pad
      val pad = payload.length & 1
      val b = ByteBuffer.allocate(8 + payload.length + pad).order(le)
      b.put(id.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      b.array()
    }
    def list(subtype: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", subtype.getBytes("US-ASCII") ++ children)
    val avih = ByteBuffer.allocate(56).order(le)
    avih.putInt(usPerFrame.toInt)
      .putInt(0).putInt(0).putInt(0)   // maxBytesPerSec, padding, flags
      .putInt(frames.size)             // dwTotalFrames
      .putInt(0).putInt(1).putInt(0)   // initialFrames, streams, sugBuf
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    val strh = ByteBuffer.allocate(56).order(le)
    strh.put("vids".getBytes("US-ASCII")).put(codec.getBytes("US-ASCII"))
      .putInt(0).putInt(0).putInt(0)             // flags, prio/lang, init
      .putInt(usPerFrame.toInt).putInt(1000000)  // dwScale/dwRate = period
      .putInt(0).putInt(frames.size)             // start, length (frames)
      .putInt(0).putInt(0).putInt(0)             // sugBuf, quality, sampleSize
      .putShort(0).putShort(0)
      .putShort(width.toShort).putShort(height.toShort) // rcFrame
    val strf = ByteBuffer.allocate(40).order(le)
    strf.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24)
    if (codec == "DIB ") strf.putInt(0) // biCompression BI_RGB
    else strf.put(codec.getBytes("US-ASCII"))
    strf.putInt((3 * width + 3) / 4 * 4 * height) // biSizeImage
      .putInt(0).putInt(0).putInt(0).putInt(0)
    val hdrl = list("hdrl", chunk("avih", avih.array()) ++
      list("strl", chunk("strh", strh.array()) ++ chunk("strf", strf.array())))
    // single-allocation join (a fold of Array ++ Array re-copies the
    // accumulated payload per frame — quadratic in total frame bytes,
    // and this runs per row on the scan stage)
    val frameChunks =
      frames.map(chunk(if (codec == "DIB ") "00db" else "00dc", _))
    val joined = new Array[Byte](frameChunks.iterator.map(_.length).sum)
    var pos = 0
    frameChunks.foreach { c =>
      System.arraycopy(c, 0, joined, pos, c.length); pos += c.length
    }
    val movi = list("movi", joined)
    val payload = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    require(payload.length.toLong + 8 <= Int.MaxValue,
      "AVI payload overflows a RIFF u32")
    val out = ByteBuffer.allocate(8 + payload.length).order(le)
    out.put("RIFF".getBytes("US-ASCII")).putInt(payload.length).put(payload)
    out.array()
  }

  private def putIdentityMatrix(buf: ByteBuffer): Unit = {
    buf.putInt(0x00010000).putInt(0).putInt(0)
    buf.putInt(0).putInt(0x00010000).putInt(0)
    buf.putInt(0).putInt(0).putInt(0x40000000)
  }

  private def box(kind: String, payload: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + payload.length).order(ByteOrder.BIG_ENDIAN)
    buf.putInt(8 + payload.length).put(kind.getBytes("US-ASCII")).put(payload)
    buf.array()
  }

  // ---- parsing ------------------------------------------------------

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  private def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** RIFF/WAVE chunk walk: returns fmt + data-derived metadata, None on
    * anything malformed (short header, missing chunks, zero rates). */
  def parseWav(bytes: Array[Byte]): Option[WavMeta] = {
    if (bytes == null || bytes.length < 44) return None
    if (fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "WAVE") return None
    // Long offsets: a crafted chunk size near Int.MaxValue must not wrap
    // the cursor negative and crash the walk — any declared size that
    // runs past the buffer is corrupt, full stop
    var off = 12L
    var fmtCode, channels, sampleRate, bits = 0
    var byteRate = 0L
    var dataLen = -1L
    var dataOff = -1
    while (off + 8 <= bytes.length) {
      val o = off.toInt
      val id = fourcc(bytes, o)
      val size = u32le(bytes, o + 4)
      if (size < 0 || off + 8 + size > bytes.length) return None
      if (id == "fmt " && size >= 16) {
        fmtCode = u16le(bytes, o + 8)
        channels = u16le(bytes, o + 10)
        sampleRate = u32le(bytes, o + 12).toInt
        byteRate = u32le(bytes, o + 16)
        bits = u16le(bytes, o + 22)
      } else if (id == "data") {
        dataLen = size
        dataOff = o + 8
      }
      off += 8 + size + (size & 1) // chunks are even-padded
    }
    // Only uncompressed layouts: 1 = PCM, 0xFFFE = WAVE_FORMAT_EXTENSIBLE
    // (PCM with a channel mask). A compressed RIFF payload (ADPCM, mu-law,
    // MP3-in-RIFF) would otherwise parse to a confidently WRONG duration;
    // corrupt-safe means None, not a plausible lie.
    if (fmtCode != 1 && fmtCode != 0xFFFE) None
    else if (channels <= 0 || sampleRate <= 0 || bits <= 0 || bits % 8 != 0 ||
      dataLen < 0) None
    // For the PCM layouts admitted above, the declared byte rate is fully
    // determined by rate × channels × bytes/sample; a header whose field
    // disagrees (a lying byteRate=1 would yield a duration off by orders
    // of magnitude) is the same plausible-lie class as a compressed
    // fmtCode — corrupt-safe means None, not a confidently wrong number.
    else if (byteRate != sampleRate.toLong * channels * (bits / 8)) None
    else Some(WavMeta(channels, sampleRate, bits, dataLen * 1000L / byteRate,
      dataOff, dataLen.toInt))
  }

  /** RIFF/AVI header walk: `avih` inside `LIST hdrl` → dimensions, frame
    * period, frame count. None on anything malformed — same corrupt-safe
    * contract as [[parseWav]] (Long cursors, every declared size checked
    * against the buffer, overflow-checked duration product). */
  def parseAvi(bytes: Array[Byte]): Option[AviMeta] = {
    if (bytes == null || bytes.length < 12) return None
    if (fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "AVI ") return None
    // a declared extent past the buffer = truncated blob: the header
    // LIST may still be intact, but the walk returns early on finding
    // it, so the whole-extent check is what makes truncation → None
    val riffEnd = 8L + u32le(bytes, 4)
    if (riffEnd > bytes.length) return None
    var off = 12L
    while (off + 8 <= riffEnd) {
      val o = off.toInt
      val id = fourcc(bytes, o)
      val size = u32le(bytes, o + 4)
      if (size < 0 || off + 8 + size > riffEnd) return None
      if (id == "LIST" && size >= 4 && fourcc(bytes, o + 8) == "hdrl") {
        var c = off + 12 // children start after the LIST's 4-byte subtype
        val end = off + 8 + size
        var meta: Option[AviMeta] = None
        var codec = "" // strh fccHandler; stays "" without a stream list
        while (c + 8 <= end) {
          val co = c.toInt
          val cid = fourcc(bytes, co)
          val csize = u32le(bytes, co + 4)
          if (csize < 0 || c + 8 + csize > end) return None
          if (cid == "avih" && csize >= 40) {
            val p = co + 8
            val usPerFrame = u32le(bytes, p)
            val totalFrames = u32le(bytes, p + 16)
            val width = u32le(bytes, p + 32).toInt
            val height = u32le(bytes, p + 36).toInt
            if (usPerFrame <= 0 || width <= 0 || height <= 0) return None
            // dwTotalFrames is u32: above Int.MaxValue, .toInt wraps
            // negative — the same silent-truncation class the duration
            // and 16.16 requires reject. No real AVI has 2^31 frames.
            if (totalFrames > Int.MaxValue) return None
            // both fields are u32: the product can overflow a Long on
            // crafted input — reject rather than report a wrapped duration
            if (totalFrames > 0 && usPerFrame > Long.MaxValue / totalFrames)
              return None
            meta = Some(AviMeta(width, height,
              usPerFrame * totalFrames / 1000L, totalFrames.toInt))
          } else if (cid == "LIST" && csize >= 4 &&
              fourcc(bytes, co + 8) == "strl") {
            // first video stream's strh: fccType(4) then fccHandler(4)
            var s = c + 12
            val send = c + 8 + csize
            while (s + 8 <= send && codec.isEmpty) {
              val so = s.toInt
              val ssize = u32le(bytes, so + 4)
              if (ssize < 0 || s + 8 + ssize > send) return None
              if (fourcc(bytes, so) == "strh" && ssize >= 8 &&
                  fourcc(bytes, so + 8) == "vids")
                codec = fourcc(bytes, so + 12)
              s += 8 + ssize + (ssize & 1)
            }
          }
          c += 8 + csize + (csize & 1)
        }
        return meta.map(m => m.copy(codec = codec)) // None: hdrl w/o avih
      }
      off += 8 + size + (size & 1)
    }
    None
  }

  /** Byte ranges (offset, length) of the video frame chunks (`xxdc`
    * compressed / `xxdb` uncompressed-DIB) inside `LIST movi`, in
    * stream order — for an MJPEG AVI each payload is a complete JPEG;
    * for a DIB AVI it is stride*height of bottom-up BGR rows. Empty on
    * malformed input: a truncated blob samples zero frames, never kills
    * the partition. */
  def aviFrameRanges(bytes: Array[Byte]): Vector[(Int, Int)] = {
    if (bytes == null || bytes.length < 12) return Vector.empty
    if (fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "AVI ")
      return Vector.empty
    val riffEnd = 8L + u32le(bytes, 4) // truncated blob → no frames
    if (riffEnd > bytes.length) return Vector.empty
    var off = 12L
    while (off + 8 <= riffEnd) {
      val o = off.toInt
      val id = fourcc(bytes, o)
      val size = u32le(bytes, o + 4)
      if (size < 0 || off + 8 + size > riffEnd) return Vector.empty
      if (id == "LIST" && size >= 4 && fourcc(bytes, o + 8) == "movi") {
        val out = Vector.newBuilder[(Int, Int)]
        var c = off + 12
        val end = off + 8 + size
        while (c + 8 <= end) {
          val co = c.toInt
          val cid = fourcc(bytes, co)
          val csize = u32le(bytes, co + 4)
          if (csize < 0 || c + 8 + csize > end) return Vector.empty
          if (cid.endsWith("dc") || cid.endsWith("db"))
            out += ((co + 8, csize.toInt))
          c += 8 + csize + (csize & 1)
        }
        return out.result()
      }
      off += 8 + size + (size & 1)
    }
    Vector.empty
  }

  /** ISO-BMFF box walk: moov/mvhd for timescale+duration, moov/trak/tkhd
    * (version 0) for 16.16 display dimensions; when the track carries a
    * `stbl` sample table, `numSamples` is its validated stsz count (a
    * declared table whose samples run past the buffer — a truncated
    * mdat — is corrupt: None, not a plausible half-answer). Header-only
    * blobs (no mdia) parse with numSamples 0. None on malformed input. */
  def parseMp4(bytes: Array[Byte]): Option[Mp4Meta] = {
    if (bytes == null || bytes.length < 8) return None
    val moov = findBox(bytes, 0, bytes.length, "moov").getOrElse(return None)
    val mvhd = findBox(bytes, moov._1 + 8, moov._2, "mvhd").getOrElse(return None)
    val trak = findBox(bytes, moov._1 + 8, moov._2, "trak").getOrElse(return None)
    val tkhd = findBox(bytes, trak._1 + 8, trak._2, "tkhd").getOrElse(return None)
    val (mo, me) = mvhd
    val (to, te) = tkhd
    if (me - mo < 28 || te - to < 92) return None
    if ((bytes(mo + 8) & 0xFF) != 0 || (bytes(to + 8) & 0xFF) != 0)
      return None // only version-0 headers are 32-bit-laid-out
    val timescale = u32be(bytes, mo + 20)
    val duration = u32be(bytes, mo + 24)
    if (timescale <= 0) return None
    val width = (u32be(bytes, to + 84) >> 16).toInt
    val height = (u32be(bytes, to + 88) >> 16).toInt
    if (width <= 0 || height <= 0) return None
    val numSamples = findStbl(bytes, trak) match {
      case None => 0 // header-only track: valid, just sample-less
      case Some(stbl) =>
        val ranges = sampleRangesIn(bytes, stbl)
        if (ranges.isEmpty) return None // declared table but unwalkable
        ranges.size
    }
    Some(Mp4Meta(width, height, duration * 1000L / timescale, numSamples))
  }

  /** (offset, length) byte extent of every sample in an ISO-BMFF blob's
    * sample table, recovered from `stsz` (sizes) + `stco` (chunk
    * offsets) + `stsc` (samples-per-chunk runs) — the MP4 mirror of
    * [[aviFrameRanges]]. Empty on anything malformed, including any
    * sample extending past the buffer (truncated mdat). */
  def mp4SampleRanges(bytes: Array[Byte]): Vector[(Int, Int)] = {
    if (bytes == null || bytes.length < 8) return Vector.empty
    val r = for {
      moov <- findBox(bytes, 0, bytes.length, "moov")
      trak <- findBox(bytes, moov._1 + 8, moov._2, "trak")
      stbl <- findStbl(bytes, trak)
    } yield sampleRangesIn(bytes, stbl)
    r.getOrElse(Vector.empty)
  }

  private def findStbl(bytes: Array[Byte],
      trak: (Int, Int)): Option[(Int, Int)] =
    for {
      mdia <- findBox(bytes, trak._1 + 8, trak._2, "mdia")
      minf <- findBox(bytes, mdia._1 + 8, mdia._2, "minf")
      stbl <- findBox(bytes, minf._1 + 8, minf._2, "stbl")
    } yield stbl

  /** Walk stsz/stco/stsc inside an already-located stbl. Every declared
    * count/offset is bounds-checked; empty on any inconsistency. */
  private def sampleRangesIn(bytes: Array[Byte],
      stbl: (Int, Int)): Vector[(Int, Int)] = {
    val stsz = findBox(bytes, stbl._1 + 8, stbl._2, "stsz")
      .getOrElse(return Vector.empty)
    val stsc = findBox(bytes, stbl._1 + 8, stbl._2, "stsc")
      .getOrElse(return Vector.empty)
    val stco = findBox(bytes, stbl._1 + 8, stbl._2, "stco")
      .getOrElse(return Vector.empty)
    // stsz: verFlags, sample_size (0 = per-sample table), sample_count
    if (stsz._2 - stsz._1 < 20) return Vector.empty
    val uniformSize = u32be(bytes, stsz._1 + 12)
    val nSamples = u32be(bytes, stsz._1 + 16)
    if (nSamples <= 0 || nSamples > Int.MaxValue) return Vector.empty
    val n = nSamples.toInt
    if (uniformSize == 0 && stsz._2 - stsz._1 < 20L + 4L * n)
      return Vector.empty
    def sampleSize(i: Int): Long =
      if (uniformSize != 0) uniformSize else u32be(bytes, stsz._1 + 20 + 4 * i)
    // stco: verFlags, entry_count, then u32 chunk offsets
    if (stco._2 - stco._1 < 16) return Vector.empty
    val nChunks = u32be(bytes, stco._1 + 12)
    if (nChunks <= 0 || nChunks > Int.MaxValue ||
      stco._2 - stco._1 < 16L + 4L * nChunks) return Vector.empty
    def chunkOffset(c: Int): Long = u32be(bytes, stco._1 + 16 + 4 * c)
    // stsc: verFlags, entry_count, then (first_chunk, samples_per_chunk,
    // sample_description_index) runs; first_chunk is 1-based and must
    // ascend — each run covers chunks [first_chunk, next run's first)
    if (stsc._2 - stsc._1 < 16) return Vector.empty
    val nRuns = u32be(bytes, stsc._1 + 12)
    if (nRuns <= 0 || nRuns > Int.MaxValue ||
      stsc._2 - stsc._1 < 16L + 12L * nRuns) return Vector.empty
    def runFirstChunk(e: Int): Long = u32be(bytes, stsc._1 + 16 + 12 * e)
    def runPerChunk(e: Int): Long = u32be(bytes, stsc._1 + 20 + 12 * e)
    val out = Vector.newBuilder[(Int, Int)]
    var sample = 0
    var run = 0
    var chunk = 0
    while (sample < n && chunk < nChunks.toInt) {
      if (run + 1 < nRuns.toInt && runFirstChunk(run + 1) <= chunk + 1)
        run += 1
      val perChunk = runPerChunk(run)
      if (perChunk <= 0 || perChunk > n) return Vector.empty
      var off = chunkOffset(chunk)
      var i = 0L
      while (i < perChunk && sample < n) {
        val size = sampleSize(sample)
        if (size < 0 || off < 0 || off + size > bytes.length)
          return Vector.empty // truncated mdat / lying table
        out += ((off.toInt, size.toInt))
        off += size
        sample += 1
        i += 1
      }
      chunk += 1
    }
    if (sample < n) return Vector.empty // table promises more than chunks hold
    out.result()
  }

  /** First sibling box named `kind` scanning from `from` (for children,
    * pass the parent's payload start = boxStart + 8) up to `until`;
    * returns (start, end) offsets of the whole box. Bounds-checked; None
    * when absent or malformed. */
  private def findBox(bytes: Array[Byte], from: Int, until: Int,
      kind: String): Option[(Int, Int)] = {
    var off = from
    val limit = math.min(until, bytes.length)
    while (off + 8 <= limit) {
      val size = u32be(bytes, off)
      if (size < 8 || off + size > limit) return None
      if (fourcc(bytes, off + 4) == kind) return Some((off, off + size.toInt))
      off += size.toInt
    }
    None
  }
}
