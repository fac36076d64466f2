package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One opaque media payload: the multimodal storage model (SURVEY.md §2
  * #29) — binary content + typed metadata, the schema a 100 TB corpus of
  * images/audio/video would use (content inline here; at scale the same
  * schema with content in object storage + offsets works identically). */
final case class MediaRecord(doc_id: Long, modality: String, content: Array[Byte])

/** Decoded per-item features. Width/height/frames come from the decoder
  * (stubbed below); bytes + digest are computed on the raw payload. */
final case class MediaFeatures(
    doc_id: Long, modality: String, n_bytes: Long, content_md5: String,
    width: Int, height: Int, n_frames: Int)

/** Multimodal pipeline plumbing m01 (SURVEY.md §2 #29).
  *
  * Spark-side design: media decode is imperative library code that can't
  * be a Catalyst expression, so it runs via `Dataset.mapPartitions` — the
  * Scala/Encoder analogue of a batched pandas UDF: one decoder instance
  * per PARTITION (init amortized across its rows), streaming iterator in,
  * streaming iterator out, no collect, partitioning preserved (zero
  * shuffle in the whole pipeline). Everything around the decode —
  * schema, binary column, partition layout, feature output — is real
  * and oracle-checked.
  *
  * THE DECODE ITSELF IS A STUB: this container has no image/audio
  * codecs, so [[StubMediaDecoder]] derives deterministic pseudo-features
  * from the payload bytes (clearly marked; swap in a real codec without
  * touching any Spark plumbing).
  */
object Multimodal {

  /** Deterministic stand-in for a real media codec (e.g. an ImageIO /
    * JCodec wrapper). Opened once per partition, closed at the end —
    * the lifecycle a real native decoder needs. */
  final class StubMediaDecoder {
    private val md = java.security.MessageDigest.getInstance("MD5")

    /** STUB: a real implementation decodes `content` and reads the true
      * dimensions / frame count. Here: fixed arithmetic on the byte
      * length, chosen to be reproducible in plain SQL for the oracle. */
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
  def extractFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      val decoder = new StubMediaDecoder
      // close on TASK COMPLETION, not iterator exhaustion: a limit/take
      // or a downstream failure abandons the iterator mid-partition,
      // and a real native decoder would leak its handle per task
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => decoder.close()))
      it.map(decoder.decode)
    }
  }
}
