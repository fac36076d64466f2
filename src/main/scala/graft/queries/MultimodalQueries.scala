package graft.queries

import graft.operators.Multimodal
import Ops._

/** Driver-contract wiring for the multimodal pipeline m01 (SURVEY.md §2
  * #29). The decode stub's pseudo-features are plain byte arithmetic, so
  * even this operator gets a full DuckDB value oracle — the oracle
  * recomputes the same features in SQL over the same payload bytes.
  */
object MultimodalQueries {

  val defs: Map[String, Q] = Map(
    "m01_multimodal" -> ((s, dir) => {
      implicit val spark = s
      Multimodal.extractFeatures(
        Multimodal.asMediaTable(t(s, dir, "documents")))
        .toDF().orderBy("doc_id")
    }),

    // m02: per-video frame sampling (one row per sampled frame — the
    // generator fan-out shape of real frame extraction)
    "m02_frame_sample" -> ((s, dir) => {
      implicit val spark = s
      Multimodal.sampleFrames(
        Multimodal.extractFeatures(
          Multimodal.asMediaTable(t(s, dir, "documents"))).toDF())
        .orderBy("doc_id", "frame_idx")
    }))

  val oracles: Map[String, String] = Map(
    "m01_multimodal" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
        |       WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_md5,
        |  CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
        |  CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 2 THEN octet_length(encode(text)) % 30 + 1
        |       ELSE 1 END AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,

    "m02_frame_sample" ->
      s"""WITH feats AS (
         |  SELECT doc_id, md5(text) AS content_md5,
         |    CAST(octet_length(encode(text)) % 30 + 1 AS INTEGER) AS n_frames
         |  FROM documents WHERE doc_id % 3 = 2),
         |idx AS (
         |  SELECT doc_id, content_md5,
         |    CAST(unnest(range(0, n_frames, ${Multimodal.FrameStep})) AS INTEGER) AS frame_idx
         |  FROM feats)
         |SELECT doc_id, frame_idx,
         |  md5(content_md5 || '|' || CAST(frame_idx AS VARCHAR)) AS frame_md5
         |FROM idx ORDER BY doc_id, frame_idx""".stripMargin)
}
