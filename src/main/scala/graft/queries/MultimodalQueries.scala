package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Multimodal

/** Multimodal-column queries: binary blobs + typed metadata derived
  * deterministically from `documents` (fixture generator in
  * [[Multimodal.fakeMediaFromDocuments]]), so the metadata/byte-length
  * plumbing is oracle-checkable; the stubbed feature extraction is
  * rows-only + unit-tested (MultimodalSpec).
  */
object MultimodalQueries extends QueryModule {

  val queries: Map[String, Q] = Map(
    // REAL typed metadata: container bytes (BMP/WAV/MP4, synthesized
    // with closed-form header fields) PARSED back in the scan stage —
    // ImageIO for images, RIFF chunk walk for WAV, ISO-BMFF box walk
    // for MP4. The oracle predicts the parse results from the same
    // closed forms, so a parser regression on any kind breaks the hash.
    "q_media_meta" -> ((s, d) =>
      Multimodal.parseMeta(
          Multimodal.containerMediaFromDocuments(Tables.documents(s, d)))
        .toDF()
        .orderBy(col("media_id"))),

    // Per-kind blob statistics (bytes never leave the scan stage).
    "q_media_stats" -> ((s, d) =>
      Multimodal.fakeMediaFromDocuments(Tables.documents(s, d))
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("bytes")).cast("long")).as("total_bytes"))
        .orderBy(col("kind"))),

    // Aspect-preserving resize targets (the real dimension math of an
    // image-resize stage; pixel resampling stays behind the codec stub).
    "q_media_resize" -> ((s, d) => {
      val media = Multimodal.fakeMediaFromDocuments(Tables.documents(s, d))
      media.select(col("media_id"),
          Multimodal.resizeTarget(col("meta"), 256).as("r"))
        .select(col("media_id"),
          col("r.width").as("rw"), col("r.height").as("rh"))
        .orderBy(col("media_id"))
    }),

    // REAL pixel resample: BMP blobs decode, downscale through a
    // genuine Graphics2D bilinear pass, and re-encode as PNG in the
    // scan stage; out dims are read back from the emitted PNG's IHDR,
    // so the oracle's closed-form prediction checks the real resample's
    // geometry end to end (pixel content is pinned by MultimodalSpec).
    // The kind filter goes BEFORE the opaque mapPartitions — Catalyst
    // can't push through it, and audio/video blobs must not pay the
    // object round-trip just to be dropped.
    "q_media_resample" -> ((s, d) => {
      val media = Multimodal.containerMediaFromDocuments(Tables.documents(s, d))
      Multimodal.resampleImages(media.where(col("kind") === "image"), maxDim = 16)
        .toDF()
        .select(col("media_id"), col("in_width"), col("in_height"),
          col("out_width"), col("out_height"), col("resized"))
        .orderBy(col("media_id"))
    }),

    // Deterministic frame sampling over video blobs: n evenly-spaced
    // byte offsets as row-local HOF arithmetic (the sampling half of
    // video frame extraction — actual frame decode sits behind the
    // codec seam). Offsets are a closed form of blob length, so the
    // whole op is oracle-checked.
    "q_media_frames" -> ((s, d) =>
      Multimodal.fakeMediaFromDocuments(Tables.documents(s, d))
        .where(col("kind") === "video")
        .select(col("media_id"),
          posexplode(Multimodal.frameOffsets(col("bytes"), 4)))
        .select(col("media_id"), col("pos").cast("int").as("frame_idx"),
          col("col").as("byte_off"))
        .orderBy(col("media_id"), col("frame_idx"))),

    // Batched per-partition feature extraction over REAL containers:
    // images decode to pixel-luminance bands, audio to PCM amplitude
    // bands, video (codec-less) to the deterministic stub — rows-only:
    // the feature values are library-internal.
    "q_media_features" -> ((s, d) =>
      Multimodal.extractFeatures(
          Multimodal.containerMediaFromDocuments(Tables.documents(s, d)))
        .toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          round(element_at(col("features"), 1), 6).as("f0"))
        .orderBy(col("media_id")))
  )

  val oracle: Map[String, String] = Map(
    "q_media_meta" ->
      """SELECT doc_id AS media_id,
        |  ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN n_chars % 64 + 1
        |       WHEN 2 THEN n_chars % 640 + 16 ELSE 0 END AS INT) AS width,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN n_chars % 48 + 1
        |       WHEN 2 THEN n_chars % 480 + 16 ELSE 0 END AS INT) AS height,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 3
        |       WHEN 1 THEN doc_id % 2 + 1 ELSE 0 END AS INT) AS channels,
        |  CAST(CASE doc_id % 3 WHEN 1 THEN 8000 ELSE 0 END AS INT)
        |    AS sample_rate,
        |  CAST(CASE doc_id % 3 WHEN 1 THEN (n_chars % 4096) // 8
        |       WHEN 2 THEN n_chars * 10 ELSE 0 END AS BIGINT) AS duration_ms
        |FROM documents ORDER BY media_id""".stripMargin,

    "q_media_resize" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CAST(n_chars % 640 + 1 AS DOUBLE) AS w,
        |    CAST(n_chars % 480 + 1 AS DOUBLE) AS h
        |  FROM documents),
        |s AS (SELECT media_id, w, h,
        |        least(1.0, 256.0 / greatest(w, h)) AS sc FROM m)
        |SELECT media_id,
        |  CAST(greatest(floor(w * sc), 1) AS INT) AS rw,
        |  CAST(greatest(floor(h * sc), 1) AS INT) AS rh
        |FROM s ORDER BY media_id""".stripMargin,

    // Mirrors resampleImages on the container fixture's image rows:
    // input dims are the BMP generator's closed forms, output dims the
    // same aspect-preserving floor math as q_media_resize at maxDim=16,
    // resized exactly when a side exceeds 16.
    "q_media_resample" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CAST(n_chars % 64 + 1 AS DOUBLE) AS w,
        |    CAST(n_chars % 48 + 1 AS DOUBLE) AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |s AS (SELECT media_id, w, h,
        |        least(1.0, 16.0 / greatest(w, h)) AS sc FROM m)
        |SELECT media_id,
        |  CAST(w AS INT) AS in_width, CAST(h AS INT) AS in_height,
        |  CAST(greatest(floor(w * sc), 1) AS INT) AS out_width,
        |  CAST(greatest(floor(h * sc), 1) AS INT) AS out_height,
        |  (w > 16 OR h > 16) AS resized
        |FROM s ORDER BY media_id""".stripMargin,

    // Mirrors frameOffsets' HOF math: floor(i * max(len,1) / n) over
    // the video-kind rows' blob lengths (bytes = utf8(text) in the
    // fake-media fixture, same closed form q_media_stats uses).
    "q_media_frames" ->
      """WITH v AS (
        |  SELECT doc_id AS media_id,
        |    greatest(octet_length(CAST(text AS BLOB)), 1) AS len
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT media_id, CAST(t.i AS INT) AS frame_idx,
        |  CAST(floor(CAST(t.i * len AS DOUBLE) / 4) AS BIGINT) AS byte_off
        |FROM v, range(4) t(i)
        |ORDER BY media_id, frame_idx""".stripMargin,

    "q_media_stats" ->
      """SELECT ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY 1 ORDER BY kind""".stripMargin
  )
}
