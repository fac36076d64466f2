package graft

import graft.operators.{Multimodal, MediaRecord}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.asMediaTable(
    spark.read.parquet(s"$sfDir/documents.parquet"))

  test("media table carries an opaque binary payload with typed metadata") {
    val schema = media.schema
    assert(schema("content").dataType.typeName == "binary")
    assert(schema("modality").dataType.typeName == "string")
    val mods = media.select("modality").distinct().collect().map(_.getString(0)).toSet
    assert(mods == Set("image", "audio", "video"))
  }

  test("feature extraction preserves row count and computes per-payload features") {
    implicit val s = spark
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() == media.count())
    val bad = feats.filter(col("n_bytes") <= 0 || length(col("content_md5")) =!= 32 ||
      col("width") < 1 || col("width") > 640 || col("n_frames") < 1).count()
    assert(bad == 0)
    // audio/image payloads always report a single frame
    assert(feats.filter(col("modality") =!= "video" && col("n_frames") =!= 1).count() == 0)
  }

  test("decode pipeline is shuffle-free (mapPartitions preserves partitioning)") {
    implicit val s = spark
    val plan = Multimodal.extractFeatures(media).queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"decode pipeline shuffles:\n$plan")
    assert(plan.contains("MapPartitions"), s"expected MapPartitions stage:\n$plan")
  }

  test("m02 frame sampling fans out only videos, stride respected, no shuffle") {
    implicit val s = spark
    val feats = Multimodal.extractFeatures(media).toDF()
    val frames = Multimodal.sampleFrames(feats)
    // one row per sampled frame: ceil(n_frames / step) rows per video
    val expected = feats.filter(col("modality") === "video")
      .select(ceil(col("n_frames").cast("double") / Multimodal.FrameStep))
      .collect().map(_.getLong(0)).sum
    assert(frames.count() == expected)
    assert(frames.filter(col("frame_idx") % Multimodal.FrameStep =!= 0).count() == 0)
    val plan = frames.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"frame fan-out shuffles:\n$plan")
    assert(plan.contains("Generate"), s"expected generator fan-out:\n$plan")
  }

  test("image rows are decoded by a REAL codec: ImageIO reports the synthetic PNG's true shape") {
    implicit val s = spark
    val feats = Multimodal.extractFeatures(media)
      .filter(col("modality") === "image")
    val wrong = feats.filter(
      col("width") =!= (col("doc_id") % 64 + 16).cast("int") ||
        col("height") =!= (col("doc_id") % 48 + 16).cast("int")).count()
    assert(wrong == 0, "ImageIO-decoded dimensions disagree with the payload generator")
    assert(feats.count() > 0)
  }

  test("m03 pixel decode recovers the exact fill color, shuffle-free") {
    implicit val s = spark
    val imgs = Multimodal.decodeImages(Multimodal.withSyntheticImages(media))
    val wrong = imgs.filter(
      col("red") =!= (col("doc_id") % 256).cast("int") ||
        col("green") =!= (col("doc_id") * 7 % 256).cast("int") ||
        col("blue") =!= (col("doc_id") * 13 % 256).cast("int")).count()
    assert(wrong == 0, "decoded center pixel disagrees with the painted fill color")
    val plan = imgs.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"image decode pipeline shuffles:\n$plan")
  }

  test("decoder stub is deterministic across invocations") {
    val r = MediaRecord(7L, "video", "payload-bytes".getBytes("UTF-8"))
    val d1 = new Multimodal.StubMediaDecoder().decode(r)
    val d2 = new Multimodal.StubMediaDecoder().decode(r)
    assert(d1 == d2)
    assert(d1.content_md5.matches("[0-9a-f]{32}"))
  }
}
