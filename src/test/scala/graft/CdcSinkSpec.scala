package graft

import graft.sources.TableLayout
import graft.streaming.CdcSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Exactly-once streaming CDC apply (the idempotent foreachBatch sink). */
class CdcSinkSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(name: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"cdc_$name").toString
    TableLayout.writeManifestedBucketed(
      Seq((0L, "seed", 0)).toDF("k", "v", "ver"),
      dir, keyCol = "k", width = 10L)
    dir
  }

  private def rows(table: String): Map[Long, (String, Int)] =
    TableLayout.readManifested(spark, table).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap

  test("a replayed batchId is skipped whole — apply is idempotent") {
    val table = freshTable("replay")
    val b0 = Seq((1L, "a", 1), (11L, "b", 1)).toDF("k", "v", "ver")
    assert(CdcSink.applyBatch(spark, table, "app1", b0, batchId = 0))
    val afterFirst = rows(table)
    val history = TableLayout.snapshots(spark, table).size
    // the crash-replay: same batch, same id — recognized and skipped
    assert(!CdcSink.applyBatch(spark, table, "app1", b0, batchId = 0))
    assert(rows(table) == afterFirst)
    assert(TableLayout.snapshots(spark, table).size == history,
      "a skipped replay must not commit a snapshot")
    // an OLDER id than the high-water mark is also a replay
    assert(CdcSink.applyBatch(spark, table, "app1",
      Seq((2L, "c", 2)).toDF("k", "v", "ver"), batchId = 1))
    assert(!CdcSink.applyBatch(spark, table, "app1", b0, batchId = 0))
  }

  test("upserts replace matched keys and the marker survives further commits") {
    val table = freshTable("upsert")
    CdcSink.applyBatch(spark, table, "app1",
      Seq((1L, "a", 1)).toDF("k", "v", "ver"), batchId = 0)
    CdcSink.applyBatch(spark, table, "app1",
      Seq((1L, "a2", 2), (21L, "x", 1)).toDF("k", "v", "ver"), batchId = 1)
    assert(rows(table) == Map(
      0L -> (("seed", 0)), 1L -> (("a2", 2)), 21L -> (("x", 1))))
    assert(TableLayout.appliedTxn(spark, table, "app1").contains(1L))
    // another writer's un-tagged commit must not disturb the mark
    TableLayout.upsertManifestedBucketed(spark, table,
      Seq((31L, "y", 1)).toDF("k", "v", "ver"))
    assert(TableLayout.appliedTxn(spark, table, "app1").contains(1L))
    // two independent apps keep independent marks
    assert(TableLayout.appliedTxn(spark, table, "other").isEmpty)
  }

  test("end-to-end: a MemoryStream CDC feed lands exactly once through restarts") {
    implicit val sq = spark.sqlContext
    val table = freshTable("e2e")
    val ckpt = java.nio.file.Files.createTempDirectory("cdc_ckpt").toString
    val stream = MemoryStream[(Long, String, Int)]
    def start() = CdcSink.attach(
      stream.toDS().toDF("k", "v", "ver"), table, "e2e.app", ckpt)
    val q1 = start()
    try {
      stream.addData((1L, "a", 1), (11L, "b", 1)); q1.processAllAvailable()
    } finally q1.stop()
    // restart against the SAME checkpoint: source replays nothing new,
    // and whatever the engine re-offers is recognized by the txn mark
    val q2 = start()
    try {
      stream.addData((1L, "a2", 2)); q2.processAllAvailable()
    } finally q2.stop()
    assert(rows(table) == Map(
      0L -> (("seed", 0)), 1L -> (("a2", 2)), 11L -> (("b", 1))))
  }
}
