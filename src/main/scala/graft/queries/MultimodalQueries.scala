package graft.queries

import graft.operators.Multimodal
import Ops._

/** Driver-contract wiring for the multimodal pipeline m01–m03 (SURVEY.md
  * §2 #29). Image rows carry REAL synthetic PNG payloads decoded by
  * javax.imageio; their dimensions/pixels are pure functions of doc_id,
  * so the DuckDB oracle predicts what a correct decoder must report
  * without decoding PNG itself. Audio/video stay on the declared stub
  * (byte arithmetic), which the oracle recomputes in SQL.
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
    }),

    // m03: pixel-level image decode — center-pixel RGB can only match
    // the oracle's doc_id arithmetic if the PNG was truly rasterized
    "m03_image_decode" -> ((s, dir) => {
      implicit val spark = s
      Multimodal.decodeImages(
        Multimodal.withSyntheticImages(
          Multimodal.asMediaTable(t(s, dir, "documents"))))
        .toDF().orderBy("doc_id")
    }))

  val oracles: Map[String, String] = Map(
    "m01_multimodal" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
        |       WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_md5,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id % 64 + 16
        |       ELSE octet_length(encode(text)) % 640 + 1 END AS INTEGER) AS width,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id % 48 + 16
        |       ELSE octet_length(encode(text)) % 480 + 1 END AS INTEGER) AS height,
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
         |FROM idx ORDER BY doc_id, frame_idx""".stripMargin,

    "m03_image_decode" ->
      """SELECT doc_id,
        |  CAST(doc_id % 64 + 16 AS INTEGER) AS width,
        |  CAST(doc_id % 48 + 16 AS INTEGER) AS height,
        |  CAST(doc_id % 256 AS INTEGER) AS red,
        |  CAST(doc_id * 7 % 256 AS INTEGER) AS green,
        |  CAST(doc_id * 13 % 256 AS INTEGER) AS blue
        |FROM documents WHERE doc_id % 3 = 0 ORDER BY doc_id""".stripMargin)
}
