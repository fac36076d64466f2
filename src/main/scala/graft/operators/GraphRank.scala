package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph ranking over an edge DataFrame — the power-iteration
  * family (PageRank/TextRank) done Spark-first: each iteration is a
  * vocabulary-sized join + aggregate, the edge table is shared across
  * iterations via one checkpoint, and lineage is truncated per
  * iteration so ten rounds cost ten short jobs, not an exponentially
  * deeper plan (d06's connected-components discipline).
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
  def pageRank(edges: DataFrame, iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1)
    val dec = DecimalType(28, 12)
    val ow = edges.groupBy("src").agg(sum("w").as("ow"))
    val e = edges.join(ow, "src").select("src", "dst", "w", "ow")
      .localCheckpoint(eager = false) // vocabulary-sized, read every iteration
    val nodes = e.select(col("src").as("word")).distinct()
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
        .localCheckpoint(eager = false)
    }
    ranks
  }
}
