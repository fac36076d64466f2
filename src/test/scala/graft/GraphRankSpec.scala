package graft

import graft.operators.GraphRank
import org.apache.spark.sql.functions._

/** t17 TextRank / GraphRank.pageRank. */
class GraphRankSpec extends SparkSpec {

  import spark.implicits._

  /** In-memory replica of the operator's decimal-exact update chain
    * (same rounding modes, same parenthesization). */
  private def ref(edges: Seq[(String, String, Long)], iters: Int): Map[String, Double] = {
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    def r12(x: Double) = BigDecimal(x).setScale(12, HALF_UP)
    val ow = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val nodes = edges.map(_._1).toSet
    var r = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2)
      r = nodes.map { n =>
        val s = in.getOrElse(n, Seq.empty)
          .map { case (src, _, w) => r12((w.toDouble * r(src)) / ow(src).toDouble) }
          .sum
        n -> BigDecimal((1.0 - 0.85) + 0.85 * s.toDouble)
          .setScale(10, HALF_UP).toDouble
      }.toMap
    }
    r
  }

  private def run(edges: Seq[(String, String, Long)], iters: Int): Map[String, Double] =
    GraphRank.pageRank(edges.toDF("src", "dst", "w"), iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("pageRank matches the in-memory decimal-exact replica bit for bit") {
    // asymmetric weighted digraph incl. a node with no incoming edges
    // (d: damping floor only) and a weighted hub
    val edges = Seq(
      ("a", "b", 3L), ("a", "c", 1L), ("b", "c", 2L), ("c", "a", 1L),
      ("d", "a", 5L), ("d", "b", 1L))
    assert(run(edges, 10) == ref(edges, 10))
  }

  test("a regular symmetric graph is the exact uniform fixed point") {
    // 2-cycle with equal weights: contribution = rank(other), so 1.0
    // is exactly stationary at every iteration
    val out = run(Seq(("a", "b", 2L), ("b", "a", 2L)), 10)
    assert(out == Map("a" -> 1.0, "b" -> 1.0))
  }

  test("a star's center outranks its leaves") {
    val leaves = (1 to 5).map(i => s"l$i")
    val edges = leaves.flatMap(l => Seq(("hub", l, 1L), (l, "hub", 1L)))
    val out = run(edges, 10)
    assert(leaves.forall(l => out("hub") > out(l)))
    assert(leaves.map(out).distinct.size == 1, "symmetric leaves must tie exactly")
  }

  test("distributed loop re-reads checkpointed inputs — upstream work is detached") {
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "w")
      .groupBy("src", "dst").agg(sum("w").as("w")) // give the edges an upstream agg
    val plan = GraphRank.pageRank(edges, 5, loopPartitions = 2)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"),
      s"expected checkpoint-backed inputs, got:\n$plan")
    // the edge-building aggregate must not replay once per reference:
    // it sits BEHIND the checkpoint, so the nested iteration plan
    // contains only the per-round dst aggregates (one per iteration),
    // never the upstream one
    val aggs = "Aggregate".r.findAllIn(plan).length
    assert(aggs <= 5 + 1,
      s"upstream work leaked past the checkpoint into the loop plan:\n$plan")
  }

  test("in-task and distributed fixpoints agree to the last bit") {
    // asymmetric weights, a floor-only node, a dst that is not a src
    // (must be absent from BOTH outputs), enough rounds to compound
    // any rounding divergence
    val edges = Seq(
      ("a", "b", 3L), ("a", "c", 1L), ("b", "c", 2L), ("c", "a", 7L),
      ("d", "a", 5L), ("d", "b", 1L), ("c", "zsink", 2L)).toDF("src", "dst", "w")
    val one = GraphRank.pageRank(edges, 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dist = GraphRank.pageRank(edges, 10, loopPartitions = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(one == dist)
    assert(!one.contains("zsink"), "dst-only node must not get a rank")
  }

  test("t17 on the fixture is deterministic and keyword-shaped") {
    val a = queries.TextQueries.defs("t17_textrank")(spark, sfDir).collect()
    val b = queries.TextQueries.defs("t17_textrank")(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
    // ranks are sorted descending and all carry the damping floor
    val ranks = a.map(_.getDouble(1))
    assert(ranks.sameElements(ranks.sortBy(-_)))
    assert(ranks.forall(_ >= (1.0 - 0.85)))
  }
}
