package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus partitioning for training pipelines: stable
  * train/val/test splits and domain-mixture rebalancing, both driven by
  * a seeded content hash rather than `rand()`/`sample()`.
  *
  * Why hash, not random: a training corpus is re-derived many times
  * (backfills, incremental ingest, reruns on more executors). A
  * hash-split assigns every row independently of partition count, row
  * order, cluster size, and every other row — so reruns reproduce the
  * exact split, new rows don't reshuffle old assignments, and the same
  * doc never migrates from test into train (the leakage failure mode of
  * `randomSplit`, whose assignment depends on partition layout).
  *
  * Scale shape: pure map-side — one md5 per row, no shuffle, no state.
  * The bucket is the first byte of md5(seed|id) compared as zero-padded
  * lowercase hex, an expression any engine reproduces bit-identically
  * (the DuckDB oracles compare the same strings).
  */
object Splits {

  /** First-byte bucket of the seeded row hash, as a 2-char lowercase hex
    * string ('00'..'ff'): lexicographic order == numeric order, so split
    * thresholds are plain string comparisons in any engine. */
  def hexBucket(idCol: Column, seed: String): Column =
    substring(md5(concat_ws("|", lit(seed), idCol.cast("string"))), 1, 2)

  /** Assign each row to train/val/test by hash bucket (out of 256):
    * `trainBuckets` → 'train', next `valBuckets` → 'val', rest 'test'.
    * Defaults ≈ 80/10/10. Deterministic, stable under corpus growth. */
  def assignSplit(df: DataFrame, idCol: Column, seed: String = "split",
      trainBuckets: Int = 205, valBuckets: Int = 25): DataFrame = {
    require(trainBuckets >= 0 && valBuckets >= 0 && trainBuckets + valBuckets <= 256,
      s"bucket counts must partition 0..256: train=$trainBuckets val=$valBuckets")
    val b = hexBucket(idCol, seed)
    df.withColumn("split",
      when(b < lit(f"$trainBuckets%02x"), "train")
        .when(b < lit(f"${trainBuckets + valBuckets}%02x"), "val")
        .otherwise("test"))
  }

  /** Rebalance a skewed domain mixture by downsampling every domain to
    * (in expectation) the size of the smallest: domain d keeps rows
    * whose bucket falls under `(256 * min_n) div n_d` of its 256 hash
    * buckets. Deterministic — the kept set is a pure function of
    * (seed, id, per-domain counts), so a rerun or a different partition
    * layout keeps exactly the same rows.
    *
    * Scale shape: the per-domain counts are one partial-aggregated
    * groupBy on |domains| keys, the scalar min is a one-row broadcast,
    * and the keep decision joins the corpus to the tiny threshold table
    * with a broadcast hash join — the corpus itself is scanned once and
    * never shuffled. Thresholds compare as 3-char zero-padded hex so
    * the keep-all threshold (0x100) still orders correctly. */
  def rebalanceDomains(df: DataFrame, domainCol: Column, idCol: Column,
      seed: String = "mix"): DataFrame = {
    val counts = df.groupBy(domainCol.as("__domain")).agg(count(lit(1)).as("domain_n"))
    val minN = counts.agg(min("domain_n").as("min_n"))
    val thresholds = counts.crossJoin(broadcast(minN))
      .select(col("__domain"), expr("(256 * min_n) div domain_n").as("__thr"))
    val bucket3 = concat(lit("0"), hexBucket(idCol, seed))
    df.join(broadcast(thresholds), domainCol === col("__domain"))
      .filter(bucket3 < format_string("%03x", col("__thr")))
      .drop("__domain", "__thr")
  }
}
