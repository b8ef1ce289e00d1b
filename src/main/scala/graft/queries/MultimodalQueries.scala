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

    "q_media_stats" ->
      """SELECT ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY 1 ORDER BY kind""".stripMargin
  )
}
