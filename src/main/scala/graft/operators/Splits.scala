package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Exact-count stratified sample: keep exactly min(k, |stratum|) rows
    * per stratum, chosen by seeded-hash rank — the balanced-eval-set /
    * per-domain-cap builder. Distinct from [[rebalanceDomains]], which
    * keeps an EXPECTED fraction: here the count is exact, which is what
    * an eval set or a per-source cap contract requires. Deterministic
    * like everything in this file: the kept set is a pure function of
    * (seed, ids) — reruns, repartitions and cluster resizes reproduce
    * it bit-for-bit (the id tiebreak makes even a hash collision
    * order-stable).
    *
    * Scale shape: the rank-≤-k filter over a hash-ordered window is the
    * pattern Catalyst rewrites to WindowGroupLimit — each map task
    * keeps only its local top-k per stratum BEFORE the shuffle, so a
    * billion-row stratum moves ≤ k·tasks rows, never sorts globally,
    * and the post-shuffle work is a k-row merge per stratum
    * (spec-asserted in SplitsSpec). One shuffle, on the stratum key. */
  def stratifiedSample(df: DataFrame, stratumCol: Column, idCol: Column,
      k: Int, seed: String = "strat"): DataFrame = {
    require(k > 0, s"sample size must be positive: $k")
    val rk = row_number().over(
      Window.partitionBy(stratumCol)
        .orderBy(md5(concat_ws("|", lit(seed), idCol.cast("string"))), idCol))
    df.withColumn("sample_rank", rk).filter(col("sample_rank") <= k)
  }

  /** Greedy shard packing: assign rows (in `idCol` order) to consecutive
    * training shards of ≈`budget` tokens each — the "write the corpus as
    * N bounded files/sequences" step of a training-data pipeline. A row
    * goes to shard `prefix_tokens div budget` where `prefix_tokens` is
    * the token count of all EARLIER rows: shards fill to the budget and
    * a document is never split (the last doc of a shard may overflow it,
    * classic greedy semantics).
    *
    * Scale shape — a global running sum without a global window: the
    * corpus is blocked by `idCol div blockSize`; per-block totals are one
    * partial-aggregated shuffle on n/blockSize keys; the block-offset
    * prefix sum runs on that TINY aggregate only (the single-partition
    * window touches n/blockSize rows, never the corpus — same bounded-
    * driver-state discipline as d06's convergence check); offsets join
    * back small, and the corpus-side running sum is a window PARTITIONED
    * BY block (≤ blockSize rows per window partition, fully parallel).
    * One corpus shuffle total, on the block key. */
  def packShards(df: DataFrame, idCol: Column, tokensCol: Column,
      budget: Long, blockSize: Long = 10000): DataFrame = {
    require(budget > 0 && blockSize > 0)
    val blocked = df
      .withColumn("__tokens", tokensCol.cast("long"))
      .withColumn("__id", idCol.cast("long"))
      .withColumn("__block", expr(s"__id div $blockSize"))
    val totals = blocked.groupBy("__block").agg(sum("__tokens").as("__block_sum"))
    val offsets = totals
      .withColumn("__offset", coalesce(
        sum("__block_sum").over(
          Window.orderBy("__block").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("__block", "__offset")
    val inBlock = Window.partitionBy("__block").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    blocked.join(offsets, "__block")
      .withColumn("__cum", sum("__tokens").over(inBlock) + col("__offset"))
      .withColumn("shard", expr(s"(__cum - __tokens) div $budget"))
      .withColumn("n_tokens", col("__tokens"))
      .drop("__block", "__id", "__tokens", "__offset", "__cum")
  }

  /** Token-budget corpus selection: keep the maximal SEEDED-HASH-order
    * prefix of documents whose cumulative token count stays ≤ budget —
    * "train on exactly N tokens", drawn unbiased (hash order is a
    * uniform shuffle, reproducible across reruns and backfills like
    * [[assignSplit]]).
    *
    * Scale shape: the same blocked distributed prefix sum as
    * [[packShards]], except blocks are the first two hex chars of the
    * seeded hash (256 ordered blocks) since hash order has no dense
    * integer key. Block totals aggregate map-side; the only global
    * window runs over the 256-row block-total table; in-block running
    * sums are per-block partitions. No corpus-sized single-partition
    * window anywhere.
    *
    * Returns (doc_id, n_tokens, cum_tokens) for the selected docs. */
  def tokenBudgetSample(df: DataFrame, idCol: Column, tokensCol: Column,
      budget: Long, seed: String = "budget"): DataFrame = {
    require(budget > 0)
    val blocked = df
      .withColumn("__tokens", tokensCol.cast("long"))
      .withColumn("__h", md5(concat(lit(s"$seed|"), idCol.cast("string"))))
      .withColumn("__block", substring(col("__h"), 1, 2))
    val totals = blocked.groupBy("__block").agg(sum("__tokens").as("__block_sum"))
    val offsets = totals
      .withColumn("__offset", coalesce(
        sum("__block_sum").over(
          Window.orderBy("__block").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("__block", "__offset")
    val inBlock = Window.partitionBy("__block").orderBy(col("__h"), idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    blocked.join(offsets, "__block")
      .withColumn("cum_tokens", sum("__tokens").over(inBlock) + col("__offset"))
      .filter(col("cum_tokens") <= budget)
      .select(idCol.as("doc_id"), col("__tokens").as("n_tokens"),
        col("cum_tokens"))
  }

  /** Weighted sampling without replacement by PRIORITY SAMPLING
    * (Duffield, Lund & Thorup, JACM 2007): each row draws a
    * deterministic uniform u ∈ (0,1] from a seeded md5 of its id and
    * gets priority w/u; the k highest-priority rows are the sample,
    * and the (k+1)-th priority τ is the threshold that makes
    * est_weight = max(w, τ) an unbiased subset-sum estimator — the
    * importance-weighted subsampling a curation pipeline runs when it
    * can only afford to keep k documents but must keep weight
    * estimates honest.
    *
    * Scale shape: priorities are pure map-side expressions; top-(k+1)
    * plans as TakeOrderedAndProject (per-partition top-k, driver
    * merges k+1 rows — never a global sort); τ is a one-row broadcast.
    * Cross-engine determinism: u = (md5_52bit + 1) / 2^52 and
    * priority = w / u are single IEEE-754 ops on integer-exact
    * doubles, so ranking and values are engine-identical (no ln/pow,
    * whose libm rounding differs across engines — the reason this
    * implements Duffield et al. rather than Efraimidis-Spirakis, whose
    * u^(1/w) keys need pow).
    *
    * A corpus with at most k rows is returned whole with est_weight =
    * w (no threshold exists — the estimator is exact).
    */
  def prioritySample(df: DataFrame, idCol: Column, weightCol: Column,
      k: Int, seed: String = "pri"): DataFrame = {
    require(k > 0)
    val u = (conv(substring(md5(concat(lit(s"$seed|"), idCol.cast("string"))), 1, 13),
      16, 10).cast("long") + 1).cast("double") / lit(4503599627370496.0)
    val scored = df.select(idCol.as("doc_id"),
      weightCol.cast("long").as("weight"),
      (weightCol.cast("double") / u).as("priority"))
    val topK1 = scored.orderBy(col("priority").desc, col("doc_id")).limit(k + 1)
    val thresh = topK1.agg(min("priority").as("__tau"), count(lit(1)).as("__m"))
    topK1.crossJoin(broadcast(thresh))
      .filter((col("__m") === k + 1 && col("priority") > col("__tau")) ||
        col("__m") <= k)
      .select(col("doc_id"), col("weight"), col("priority"),
        when(col("__m") === k + 1,
          greatest(col("weight").cast("double"), col("__tau")))
          .otherwise(col("weight").cast("double")).as("est_weight"))
  }
}
