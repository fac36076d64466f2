package graft

import graft.operators.{MediaRecord, Multimodal}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.asMediaTable(
    spark.read.parquet(s"$sfDir/documents.parquet"))

  test("ingest-once media store: encoded once, decode of stored bytes matches in-line synthesis") {
    implicit val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_media_store").toString + "/t"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val stored = Multimodal.materializeMedia(docs, dir)
    // the store is real parquet with a commit marker, one row per doc
    assert(new java.io.File(dir, "_SUCCESS").exists())
    assert(stored.count() == docs.count())
    // second call must REUSE the files, not re-encode (write-once):
    // mtimes unchanged across the call
    def mtimes = new java.io.File(dir).listFiles().map(f => f.getName -> f.lastModified).toMap
    val before = mtimes
    Multimodal.materializeMedia(docs, dir)
    assert(mtimes == before, "second materialize rewrote the store")
    // decoding STORED bytes yields exactly the features of fresh synthesis
    val fromStore = Multimodal.extractFeatures(stored, () => new Multimodal.JdkMediaDecoder)
      .toDF().orderBy("doc_id").collect().toSeq
    val inline = Multimodal.extractFeatures(media).toDF()
      .orderBy("doc_id").collect().toSeq
    assert(fromStore == inline)
  }

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
      col("n_frames").isNull || col("n_frames") < 1).count()
    assert(bad == 0)
    // raster dims exist exactly for raster modalities
    assert(feats.filter(col("modality") === "audio" && col("width").isNotNull).count() == 0)
    assert(feats.filter(col("modality") =!= "audio" && col("width").isNull).count() == 0)
    // images are single-frame; videos report the real container count
    assert(feats.filter(col("modality") === "image" && col("n_frames") =!= 1).count() == 0)
    assert(feats.filter(col("modality") === "video" &&
      (col("n_frames") < 2 || col("n_frames") > 13)).count() == 0)
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
    val imgs = Multimodal.decodeImages(Multimodal.withSyntheticMedia(media))
    val wrong = imgs.filter(
      col("red") =!= (col("doc_id") % 256).cast("int") ||
        col("green") =!= (col("doc_id") * 7 % 256).cast("int") ||
        col("blue") =!= (col("doc_id") * 13 % 256).cast("int")).count()
    assert(wrong == 0, "decoded center pixel disagrees with the painted fill color")
    val plan = imgs.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"image decode pipeline shuffles:\n$plan")
  }

  test("m04 WAV decode recovers format, sample count and PCM peak, shuffle-free") {
    implicit val s = spark
    val audio = Multimodal.decodeAudio(Multimodal.withSyntheticMedia(media))
    val wrong = audio.filter(
      col("sample_rate") =!= (lit(8000) + col("doc_id") % 5 * 2000).cast("int") ||
        col("channels") =!= 1 ||
        col("n_samples") =!= (col("doc_id") % 400 + 100) ||
        col("peak") =!= (col("doc_id") % 900 + 100).cast("int")).count()
    assert(wrong == 0, "decoded WAV disagrees with the payload generator")
    assert(audio.count() > 0)
    val plan = audio.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"audio decode pipeline shuffles:\n$plan")
  }

  test("m05 video frame decode rasterizes the sampled TIFF pages, shuffle-free") {
    implicit val s = spark
    val frames = Multimodal.decodeVideoFrames(Multimodal.withSyntheticMedia(media))
    val wrong = frames.filter(
      col("width") =!= (col("doc_id") % 32 + 8).cast("int") ||
        col("height") =!= (col("doc_id") % 24 + 8).cast("int") ||
        col("red") =!= ((col("doc_id") + col("frame_idx") * 17) % 256).cast("int") ||
        col("green") =!= ((col("doc_id") * 3 + col("frame_idx") * 7) % 256).cast("int") ||
        col("blue") =!= ((col("doc_id") * 5 + col("frame_idx") * 11) % 256).cast("int")).count()
    assert(wrong == 0, "decoded frame pixel disagrees with the painted fill color")
    // frame sampling stride holds and frame 0 always present
    assert(frames.filter(col("frame_idx") % Multimodal.FrameStep =!= 0).count() == 0)
    assert(frames.filter(col("frame_idx") === 0).count() ==
      media.filter(col("modality") === "video").count())
    val plan = frames.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"video decode pipeline shuffles:\n$plan")
  }

  test("m06 resize rasterizes real thumbnails: fixed dims, fill color preserved, shuffle-free") {
    implicit val s = spark
    val thumbs = Multimodal.resizeImages(Multimodal.withSyntheticMedia(media))
    val rows = thumbs.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(t => t.thumb_width == Multimodal.ThumbSize &&
      t.thumb_height == Multimodal.ThumbSize))
    // a solid source resizes to a solid thumbnail: center pixel must be
    // the generator's fill color, src dims the decoded originals
    assert(rows.forall { t =>
      t.red == Multimodal.ImageSynth.red(t.doc_id) &&
        t.green == Multimodal.ImageSynth.green(t.doc_id) &&
        t.blue == Multimodal.ImageSynth.blue(t.doc_id) &&
        t.src_width == Multimodal.ImageSynth.width(t.doc_id)
    })
    // one row per image, none for other modalities
    assert(rows.length == media.filter(col("modality") === "image").count())
    val plan = thumbs.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"resize must be map-side:\n$plan")
  }

  test("decode-once feature artifact: every projection equals its live-decode form; artifact reused") {
    implicit val s = spark
    val root = java.nio.file.Files.createTempDirectory("graft_decoded").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val feats = Multimodal.materializeDecodedFeatures(docs, s"$root/media", s"$root/decoded")
    val stored = Multimodal.materializeMedia(docs, s"$root/media")
    def rows(df: org.apache.spark.sql.DataFrame, by: String*) =
      df.orderBy(by.map(col): _*).collect().toSeq
    // m01 projection == live extractFeatures
    assert(rows(feats.select("doc_id", "modality", "n_bytes", "content_md5",
        "width", "height", "n_frames"), "doc_id") ==
      rows(Multimodal.extractFeatures(stored, () => new Multimodal.JdkMediaDecoder).toDF(), "doc_id"))
    // m03 projection == live decodeImages
    assert(rows(feats.filter(col("modality") === "image")
        .select("doc_id", "width", "height", "red", "green", "blue"), "doc_id") ==
      rows(Multimodal.decodeImages(stored).toDF(), "doc_id"))
    // m04 projection == live decodeAudio
    assert(rows(feats.filter(col("modality") === "audio")
        .select("doc_id", "sample_rate", "channels", "n_samples", "duration_ms", "peak"), "doc_id") ==
      rows(Multimodal.decodeAudio(stored).toDF(), "doc_id"))
    // m05 projection (unnested frames) == live decodeVideoFrames
    assert(rows(feats.filter(col("modality") === "video")
        .select(col("doc_id"), explode(col("frames")).as("f"))
        .select(col("doc_id"), col("f.frame_idx").as("frame_idx"),
          col("f.width").as("width"), col("f.height").as("height"),
          col("f.red").as("red"), col("f.green").as("green"), col("f.blue").as("blue")),
        "doc_id", "frame_idx") ==
      rows(Multimodal.decodeVideoFrames(stored).toDF(), "doc_id", "frame_idx"))
    // m06 projection == live resizeImages
    assert(rows(feats.filter(col("modality") === "image")
        .select(col("doc_id"), col("width").as("src_width"), col("height").as("src_height"),
          col("thumb_width"), col("thumb_height"),
          col("thumb_red").as("red"), col("thumb_green").as("green"),
          col("thumb_blue").as("blue")), "doc_id") ==
      rows(Multimodal.resizeImages(stored).toDF(), "doc_id"))
    // second resolution reuses the committed files (fingerprint match)
    def mtimes = new java.io.File(s"$root/decoded").listFiles()
      .map(f => f.getName -> f.lastModified).toMap
    val before = mtimes
    Multimodal.materializeDecodedFeatures(docs, s"$root/media", s"$root/decoded")
    assert(mtimes == before, "second materialize rewrote the feature store")
  }

  test("decoder is deterministic across instances (same payload, same features)") {
    val wav = Multimodal.AudioSynth.wav(7L)
    val r = MediaRecord(7L, "audio", "payload-bytes".getBytes("UTF-8"), wav)
    val d1 = new Multimodal.JdkMediaDecoder
    val d2 = new Multimodal.JdkMediaDecoder
    try {
      val f1 = d1.decode(r)
      val f2 = d2.decode(r)
      assert(f1 == f2)
      assert(f1.content_md5.matches("[0-9a-f]{32}"))
      assert(f1.n_frames.contains(Multimodal.AudioSynth.nSamples(7L)))
    } finally { d1.close(); d2.close() }
  }

  test("m07 near-dup: same 32-level color bucket clusters, different bucket splits") {
    implicit val s = spark
    import spark.implicits._
    // two fills inside one 32-wide bucket (96..127) + one outside it:
    // doc 0 -> (3,0,1) after /32 on (100,10,50); doc 1 -> (3,0,1) on
    // (127,31,63); doc 2 -> (0,0,0) on (10,5,5)
    def png(r: Int, g: Int, b: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gg = img.createGraphics()
      try { gg.setColor(new java.awt.Color(r, g, b)); gg.fillRect(0, 0, 8, 8) }
      finally gg.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val recs = Seq(
      MediaRecord(0L, "image", Array.emptyByteArray, png(100, 10, 50)),
      MediaRecord(1L, "image", Array.emptyByteArray, png(127, 31, 63)),
      MediaRecord(2L, "image", Array.emptyByteArray, png(10, 5, 5))).toDS()
    val buckets = Multimodal.decodeImages(recs).toDF()
      .groupBy(floor(col("red") / 32).cast("int").as("rb"),
        floor(col("green") / 32).cast("int").as("gb"),
        floor(col("blue") / 32).cast("int").as("bb"))
      .agg(count(lit(1)).as("n"), min("doc_id").as("keeper"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(buckets == Map(
      (3, 0, 1) -> ((2L, 0L)),  // docs 0 and 1 cluster
      (0, 0, 0) -> ((1L, 2L)))) // doc 2 stands alone
  }

  test("m01 sampled raster audit catches a corrupt-raster/valid-header payload") {
    implicit val s = spark
    import spark.implicits._
    // the metadata chain is header-only (round-15 narrowing); the
    // round-17 audit fully decodes a deterministic 1-in-256 sample.
    // Plant a payload whose IHDR parses but whose IDAT is garbage:
    // on a SAMPLED doc the audit must fail the job loudly; on an
    // UNSAMPLED doc the header-only chain passes — which is exactly
    // the documented sampling semantics.
    val selected = (0L to 100000L).find(Multimodal.rasterAuditSelected).get
    val unselected = (0L to 100000L).find(id => !Multimodal.rasterAuditSelected(id)).get
    def corrupt(png: Array[Byte]): Array[Byte] = {
      val out = png.clone()
      val tag = "IDAT".getBytes("US-ASCII")
      val at = out.indices.find(i => i + 4 <= out.length &&
        out(i) == tag(0) && out(i + 1) == tag(1) &&
        out(i + 2) == tag(2) && out(i + 3) == tag(3)).get
      (at + 4 until math.min(at + 12, out.length)).foreach(i =>
        out(i) = (out(i) ^ 0xff).toByte)
      out
    }
    def rec(id: Long) = MediaRecord(id, "image",
      Array.emptyByteArray, corrupt(Multimodal.ImageSynth.png(id)))
    // unsampled: header-only pass survives the corrupt raster
    val ok = Multimodal.extractFeatures(Seq(rec(unselected)).toDS(),
      () => new Multimodal.JdkMediaDecoder).collect()
    assert(ok.length == 1 && ok(0).width.isDefined)
    // sampled: the audit's full decode fails loudly with the doc id
    val e = intercept[Throwable] {
      Multimodal.extractFeatures(Seq(rec(selected)).toDS(),
        () => new Multimodal.JdkMediaDecoder).collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("undecodable image payload") || msgs.contains("raster audit"),
      s"expected the raster audit to reject the payload, got: $msgs")
  }
}
