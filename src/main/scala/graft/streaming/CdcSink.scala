package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.sources.TableLayout

/** Exactly-once streaming CDC apply into a range-bucketed manifest
  * table — the Delta-style idempotent `foreachBatch` sink.
  *
  * Structured Streaming guarantees at-least-once invocation of
  * foreachBatch: after a crash the last micro-batch REPLAYS with the
  * same batchId. Exactly-once therefore comes from idempotence: each
  * applied batch commits its snapshot dir tagged `-txn-<appId>-<id>`
  * (one atomic commit carries data AND marker —
  * [[TableLayout.appliedTxn]]), and a replayed batch whose id is at or
  * below the recorded high-water mark is skipped whole.
  *
  * Scale shape: the apply is [[TableLayout.upsertManifestedBucketed]] —
  * partition-scoped copy-on-write, so a micro-batch rewrites only the
  * buckets its keys touch, and cost tracks the batch's key-locality,
  * never the table size. Readers see old-or-new atomically throughout.
  */
object CdcSink {

  /** Apply one CDC micro-batch idempotently. Returns true if applied,
    * false if recognized as a replay and skipped. Rows REPLACE current
    * rows sharing the table's bucket key (MERGE semantics); callers
    * ensure one row per key within a batch (the usual CDC compaction —
    * latest change per key wins — happens upstream). */
  def applyBatch(spark: SparkSession, tablePath: String, appId: String,
      batch: DataFrame, batchId: Long): Boolean = {
    require(appId.matches("[A-Za-z0-9_.]+"),
      s"appId '$appId' must stay clear of the snapshot-line separators")
    val applied = TableLayout.appliedTxn(spark, tablePath, appId)
    if (applied.exists(_ >= batchId)) false
    else {
      TableLayout.upsertManifestedBucketed(spark, tablePath, batch,
        dirTag = s"-txn-$appId-$batchId")
      true
    }
  }

  /** Wire a streaming DataFrame as a CDC feed into `tablePath`.
    * `checkpoint` is the Structured Streaming checkpoint location —
    * batchIds are stable across restarts BECAUSE of it, which is what
    * makes the txn high-water mark meaningful. */
  def attach(cdc: DataFrame, tablePath: String, appId: String,
      checkpoint: String): StreamingQuery =
    cdc.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, tablePath, appId, batch, batchId)
        ()
      }
      .start()
}
