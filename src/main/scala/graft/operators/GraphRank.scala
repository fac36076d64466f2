package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph ranking over an edge DataFrame — the power-iteration
  * family (PageRank/TextRank) done Spark-first: each iteration is a
  * vocabulary-sized join + aggregate, the edge table is shared across
  * iterations via one checkpoint, and the fixed iteration count builds
  * ONE nested lazy plan evaluated in a single action (see the
  * in-method note for why this beats per-round checkpointing here and
  * when the d06 discipline applies instead).
  *
  * Reference evidence: the reference engine has no iterative surface at
  * all (executor.rs stops at joins/aggregates); this is part of the
  * beyond-the-reference analytics the engine gains on Spark, like
  * streaming and window functions.
  */
object GraphRank {

  /** Weighted PageRank with the Mihalcea-Tarau (TextRank) update
    *
    *   rank(v) = (1-d) + d * Σ_{u→v} rank(u) * w(u,v) / out_w(u)
    *
    * run for a FIXED number of iterations. `edges` must carry columns
    * `src`, `dst`, `w` (integer weight); ranks start at 1.0.
    *
    * Cross-engine determinism (the property that makes a 10-iteration
    * fixpoint value-oracle-able at all): each edge contribution is one
    * fixed parenthesization of IEEE-754 ops on integer-exact doubles,
    * rounded once to 12 dp; contributions sum in exact DECIMAL (so
    * accumulation order cannot change the total); the damped update
    * rounds once to 10 dp. Identical arithmetic in the DuckDB oracle's
    * unrolled-CTE chain reproduces every iteration bit for bit.
    *
    * Scale shape: out-weights are one vocabulary-sized aggregate; the
    * per-iteration join keys on `src` (rank side is nodes-sized, AQE
    * picks broadcast when it fits); the aggregate shuffles edge
    * contributions on `dst` with map-side partials. Nothing corpus-
    * sized survives into the loop — callers aggregate their corpus
    * down to the edge list first. Nodes without incoming edges keep
    * the damping floor (1-d) via the left join.
    */
  def pageRank(edges: DataFrame, iterations: Int, damping: Double = 0.85,
      loopPartitions: Int = 1): DataFrame = {
    require(iterations >= 1 && loopPartitions >= 1)
    val dec = DecimalType(28, 12)
    val ow = edges.groupBy("src").agg(sum("w").as("ow"))
    // The two tables every iteration re-reads — the joined edge list
    // and the node set — are checkpointed, so the corpus-side work
    // behind them runs ONCE however many times the loop references
    // them. The ITERATIONS themselves build one nested lazy plan
    // evaluated in a single action: a fixed small iteration count
    // needs no per-round materialization, and ten nested tiny-table
    // join+aggregate rounds cost ten pipelined stages instead of ten
    // driver-coordinated checkpoint jobs (measured 2.3s → below 1s at
    // sf0.1). An UNBOUNDED data-dependent loop (d06's connected
    // components) must checkpoint per round instead — that discipline
    // is about runaway lineage, which a fixed depth of 10 never
    // reaches. AQE sizes the per-iteration join strategy (the rank
    // side is nodes-sized, so it broadcasts when it fits).
    // The loop's working set is vocabulary-bounded — it never grows
    // with the corpus, only with the node set — so the fixpoint rounds
    // run on `loopPartitions` partitions (default 1: a single task
    // comfortably holds ≲10⁷ nodes' state, and single-partition
    // stages sidestep per-iteration shuffle-coordination overhead,
    // which dominated at 32 partitions). The corpus-sized work —
    // building the edge list — happened upstream at full parallelism
    // and is detached here by the checkpoint.
    val e = edges.join(ow, "src").select("src", "dst", "w", "ow")
      .repartition(loopPartitions)
      .localCheckpoint(eager = false)
    val nodes = e.select(col("src").as("word")).distinct()
      .localCheckpoint(eager = false)
    var ranks = nodes.withColumn("rank", lit(1.0))
    for (_ <- 1 to iterations) {
      val contribs = e.join(ranks.withColumnRenamed("word", "src"), "src")
        .select(col("dst"),
          round((col("w").cast("double") * col("rank")) / col("ow").cast("double"), 12)
            .as("c"))
        .groupBy(col("dst").as("word"))
        .agg(sum(col("c").cast(dec)).as("s"))
      // (1.0 - damping) is COMPUTED, not a pre-folded literal: the
      // oracle computes `1.0 - 0.85` too, and the double difference is
      // not the double nearest to the decimal string "0.15"
      ranks = nodes.join(contribs, Seq("word"), "left")
        .select(col("word"),
          round((lit(1.0) - lit(damping)) +
            lit(damping) * coalesce(col("s").cast("double"), lit(0.0)), 10).as("rank"))
    }
    ranks
  }
}
