package graft

import org.apache.spark.sql.functions.col

/** Dev utility: per-modality timing breakdown of the live codec chain
  * (m01_decode is the suite's largest entry at sf10 — before touching a
  * codec path, know which modality pays). Times, over the committed
  * media store of `SPARK_GRAFT_SF_DIR`:
  *
  *   - the full [[graft.operators.Multimodal.decodeAllFeatures]] pass
  *     (what m01_decode runs), and
  *   - each single-modality decoder alone (image / audio / video),
  *
  * one untimed warmup + two timed passes each, min kept — the Bench
  * discipline. Output: one JSON line per measurement.
  */
object DecodeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    implicit val spark = GraftEngine.session(GraftConfig(
      master = "local[32]", appName = "graft-decode-probe", shufflePartitions = 32))
    import graft.operators.Multimodal
    val media = Multimodal.materializeMedia(
      spark.read.parquet(s"$sfDir/documents.parquet"),
      graft.queries.MultimodalQueries.mediaStorePath(sfDir))

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val best = math.min(once(), once())
      println(f"""{"probe":"$name","sec":$best%.3f}""")
    }

    time("metadata_chain")(Multimodal.extractFeatures(
      media, () => new Multimodal.JdkMediaDecoder).toDF())
    time("m01_decode_query")(
      graft.queries.Queries.all("m01_decode")(spark, sfDir))
    time("decode_all")(Multimodal.decodeAllFeatures(media).toDF())
    time("image_only")(Multimodal.decodeImages(media).toDF())
    time("image_resize")(Multimodal.resizeImages(media).toDF())
    time("audio_only")(Multimodal.decodeAudio(media).toDF())
    time("video_only")(Multimodal.decodeVideoFrames(media).toDF())
    spark.stop()
  }
}
