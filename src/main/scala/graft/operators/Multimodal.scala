package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One opaque media payload: the multimodal storage model (SURVEY.md §2
  * #29) — binary content + typed metadata, the schema a 100 TB corpus of
  * images/audio/video would use (content inline here; at scale the same
  * schema with content in object storage + offsets works identically).
  *
  * `content` is the source payload bytes; `media` is the encoded media
  * object for modalities with a real codec (PNG bytes for images; null
  * for audio/video, which stay stub-decoded — see [[Multimodal]]). */
final case class MediaRecord(doc_id: Long, modality: String,
    content: Array[Byte], media: Array[Byte] = null)

/** Decoded per-item features. Width/height come from the REAL codec for
  * images ([[Multimodal.ImageIoMediaDecoder]]) and from the declared
  * stub for audio/video; bytes + digest are computed on the raw source
  * payload. */
final case class MediaFeatures(
    doc_id: Long, modality: String, n_bytes: Long, content_md5: String,
    width: Int, height: Int, n_frames: Int)

/** Pixel-level image features (m03): dimensions plus the center-pixel
  * channels — values that only a true pixel decode can produce. */
final case class ImageFeatures(
    doc_id: Long, width: Int, height: Int, red: Int, green: Int, blue: Int)

/** Multimodal pipeline plumbing m01/m02/m03 (SURVEY.md §2 #29).
  *
  * Spark-side design: media decode is imperative library code that can't
  * be a Catalyst expression, so it runs via `Dataset.mapPartitions` — the
  * Scala/Encoder analogue of a batched pandas UDF: one decoder instance
  * per PARTITION (init amortized across its rows), streaming iterator in,
  * streaming iterator out, no collect, partitioning preserved (zero
  * shuffle in the whole pipeline).
  *
  * The IMAGE path is a real codec: `javax.imageio` (JDK-built-in,
  * headless-safe) decodes PNG payloads and reports true dimensions and
  * pixels. Audio/video decode remains A DECLARED STUB (this container
  * has no audio/video codecs): [[StubMediaDecoder]] derives
  * deterministic pseudo-features from the payload bytes, behind the
  * same [[MediaDecoder]] interface a JCodec/FFmpeg wrapper would use.
  */
object Multimodal {

  /** The per-partition decoder lifecycle every codec integration needs:
    * opened once per partition, rows streamed through, closed on task
    * completion (a native decoder holds handles that must not leak). */
  trait MediaDecoder {
    def decode(r: MediaRecord): MediaFeatures
    def close(): Unit
  }

  /** Deterministic stand-in for the audio/video codecs this container
    * lacks. STUB: fixed arithmetic on the byte length, chosen to be
    * reproducible in plain SQL for the oracle. */
  final class StubMediaDecoder extends MediaDecoder {
    private val md = java.security.MessageDigest.getInstance("MD5")

    def decode(r: MediaRecord): MediaFeatures = {
      val n = r.content.length.toLong
      val hex = md.digest(r.content).map("%02x".format(_)).mkString
      md.reset()
      MediaFeatures(
        doc_id = r.doc_id, modality = r.modality, n_bytes = n,
        content_md5 = hex,
        width = (n % 640).toInt + 1,
        height = (n % 480).toInt + 1,
        n_frames = if (r.modality == "video") (n % 30).toInt + 1 else 1)
    }

    def close(): Unit = ()
  }

  /** REAL image decode via javax.imageio: image rows get their true
    * decoded dimensions (the PNG is actually parsed); other modalities
    * fall through to the declared stub. Raises on an undecodable image
    * payload rather than inventing features. */
  final class ImageIoMediaDecoder extends MediaDecoder {
    private val stub = new StubMediaDecoder

    def decode(r: MediaRecord): MediaFeatures =
      if (r.modality == "image" && r.media != null) {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
        require(img != null, s"undecodable image payload for doc ${r.doc_id}")
        stub.decode(r).copy(width = img.getWidth, height = img.getHeight)
      } else stub.decode(r)

    def close(): Unit = stub.close()
  }

  /** Deterministic synthetic PNGs for the test corpus: dimensions and
    * fill color are pure functions of doc_id, so the DuckDB oracle can
    * predict what a CORRECT decoder must report without being able to
    * decode PNG itself — if ImageIO misread the payload, the compare
    * fails. (Real deployments read actual image bytes here instead.) */
  object ImageSynth {
    def width(docId: Long): Int = (docId % 64 + 16).toInt
    def height(docId: Long): Int = (docId % 48 + 16).toInt
    def red(docId: Long): Int = (docId % 256).toInt
    def green(docId: Long): Int = (docId * 7 % 256).toInt
    def blue(docId: Long): Int = (docId * 13 % 256).toInt

    def png(docId: Long): Array[Byte] = {
      val (w, h) = (width(docId), height(docId))
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (red(docId) << 16) | (green(docId) << 8) | blue(docId)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /** Attach the multimodal schema to the documents table: payload as an
    * opaque binary column + modality metadata (deterministic assignment
    * by id so the oracle can reproduce it). */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("modality"),
      col("text").cast("binary").as("content"))

  /** Fill the `media` column for image rows with synthetic PNG bytes
    * (encode is imperative codec code → mapPartitions, same stage as the
    * downstream decode: no shuffle, nothing materialized). */
  def withSyntheticImages(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    media.withColumn("media", lit(null).cast("binary")).as[MediaRecord]
      .mapPartitions(_.map { r =>
        if (r.modality == "image") r.copy(media = ImageSynth.png(r.doc_id)) else r
      })
  }

  /** m02: frame sampling — every `step`-th frame of each video, one
    * output row per sampled frame. This is the one-row→many-rows shape
    * real frame extraction has; the per-frame decode is the same stub
    * (a deterministic digest of payload-digest + frame index) so the
    * whole pipeline stays oracle-checkable. `explode(sequence(...))` is
    * a generator inside the scan stage: no shuffle, output rows are
    * produced streaming in the same task that read the input split —
    * exactly how a 100 TB video corpus must fan out (never materialize
    * all frames of a partition at once, never collect). */
  def sampleFrames(features: DataFrame, step: Int = FrameStep): DataFrame =
    features.filter(col("modality") === "video")
      .select(col("doc_id"), col("content_md5"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(concat(col("content_md5"), lit("|"), col("frame_idx").cast("string")))
          .as("frame_md5"))

  val FrameStep = 5

  /** Partition-batched decode/feature-extract: one decoder per
    * partition, rows streamed through it. The only stage outside
    * whole-stage codegen — by design, it wraps library code. */
  def extractFeatures(media: Dataset[MediaRecord],
      newDecoder: () => MediaDecoder)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val decoder = newDecoder()
      // close on TASK COMPLETION, not iterator exhaustion: a limit/take
      // or a downstream failure abandons the iterator mid-partition,
      // and a real native decoder would leak its handle per task
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => decoder.close()))
      it.map(decoder.decode)
    }
  }

  /** The m01 pipeline on a raw media table: real ImageIO decode for
    * images (payloads synthesized when absent), stub for audio/video. */
  def extractFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] =
    extractFeatures(withSyntheticImages(media), () => new ImageIoMediaDecoder)

  /** m03: pixel-level image decode — true dimensions AND center-pixel
    * channel values, provable against the oracle's arithmetic only if
    * the PNG was genuinely rasterized. */
  def decodeImages(media: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.filter(col("modality") === "image").mapPartitions(_.map { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
      require(img != null, s"undecodable image payload for doc ${r.doc_id}")
      val c = new java.awt.Color(img.getRGB(img.getWidth / 2, img.getHeight / 2))
      ImageFeatures(r.doc_id, img.getWidth, img.getHeight,
        c.getRed, c.getGreen, c.getBlue)
    })
  }
}
