package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle discipline for `localCheckpoint`'d DataFrames.
  *
  * `Dataset.localCheckpoint` pins its result in executor storage
  * (MEMORY_AND_DISK) and Spark never releases those blocks until the
  * RDD object is garbage-collected and the ContextCleaner notices —
  * which, in a long-lived session that checkpoints per iteration
  * (d06's label rounds, k-means' centroid rounds), means storage grows
  * with every operator call. At 100 TB that is unbounded cluster
  * storage: the round-4 bench measured a 9 ms query taking 9.26 s once
  * the session had accumulated enough stale checkpoint blocks.
  *
  * The fix is explicit: the moment an iteration's output is
  * materialized (eager checkpoint), its INPUT checkpoint is dead —
  * nothing can ever read it again — so we unpersist it immediately
  * instead of waiting for GC. The RDD behind a checkpointed Dataset is
  * reachable through the `LogicalRDD` leaf its plan wraps.
  *
  * WARNING: only release a checkpoint that is truly superseded. A
  * local checkpoint truncates lineage, so a released RDD cannot be
  * recomputed — reading it again fails.
  */
object Checkpoints {

  /** The persisted RDD behind a `localCheckpoint`'d DataFrame, if the
    * plan is one (None for plans that were never checkpointed — which
    * makes [[release]] a safe no-op on un-checkpointed inputs). */
  def checkpointRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed.collectFirst { case lr: LogicalRDD => lr.rdd }

  /** Release the storage blocks behind a SUPERSEDED checkpoint. The
    * DataFrame must never be read again (lineage is truncated; there
    * is nothing to recompute from). */
  def release(df: DataFrame): Unit =
    checkpointRdd(df).foreach(_.unpersist(blocking = false))
}
