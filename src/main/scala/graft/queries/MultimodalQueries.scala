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
    // Typed metadata projection over the media table.
    "q_media_meta" -> ((s, d) =>
      Multimodal.fakeMediaFromDocuments(Tables.documents(s, d))
        .select(col("media_id"), col("kind"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.duration_ms").as("duration_ms"))
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

    // Batched per-partition feature extraction (stub decoder) —
    // rows-only: the feature values are library-internal.
    "q_media_features" -> ((s, d) =>
      Multimodal.extractFeatures(
          Multimodal.fakeMediaFromDocuments(Tables.documents(s, d)))
        .toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          round(element_at(col("features"), 1), 6).as("f0"))
        .orderBy(col("media_id")))
  )

  val oracle: Map[String, String] = Map(
    "q_media_meta" ->
      """SELECT doc_id AS media_id,
        |  ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
        |  CAST(n_chars % 640 + 1 AS INT) AS width,
        |  CAST(n_chars % 480 + 1 AS INT) AS height,
        |  CAST(n_chars * 10 AS BIGINT) AS duration_ms
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

    "q_media_stats" ->
      """SELECT ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY 1 ORDER BY kind""".stripMargin
  )
}
