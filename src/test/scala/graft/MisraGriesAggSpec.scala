package graft

import graft.functions.MisraGriesAgg.heavyHitters
import org.apache.spark.sql.functions._

/** t18 heavy hitters: the weighted, mergeable Misra-Gries aggregate. */
class MisraGriesAggSpec extends SparkSpec {

  import spark.implicits._

  private def sketchOf(rows: Seq[(String, Int)], k: Int, parts: Int = 4) =
    rows.toDF("w", "rep").repartition(parts)
      .agg(heavyHitters(col("w"), col("rep"), k).as("sk"))
      .collect()(0).getMap[String, Long](0)

  test("a stream with at most k distinct items is counted EXACTLY") {
    val rows = Seq("a" -> 3, "b" -> 1, "a" -> 2, "c" -> 7, "b" -> 1)
    (1 to 4).foreach { parts =>
      val sk = sketchOf(rows, k = 8, parts)
      assert(sk == Map("a" -> 5L, "b" -> 2L, "c" -> 7L),
        s"no eviction may happen below capacity (parts=$parts)")
    }
  }

  test("guarantees hold under eviction, for every partitioning") {
    // 10 cold items weight 1 each + 2 hot items: N = 10 + 60 + 40 = 110
    // with k = 4: threshold N/(k+1) = 22 — both hot items must survive
    // with estimates at most 22 low, never high
    val rows = (1 to 10).map(i => s"cold$i" -> 1) ++
      Seq("hot1" -> 60, "hot2" -> 40)
    for (parts <- 1 to 5) {
      val sk = sketchOf(rows, k = 4, parts)
      assert(sk.size <= 4)
      assert(sk.contains("hot1") && sk.contains("hot2"),
        s"an item above N/(k+1) was evicted (parts=$parts): $sk")
      assert(sk("hot1") <= 60 && 60 - sk("hot1") <= 22, s"hot1 bound (parts=$parts): $sk")
      assert(sk("hot2") <= 40 && 40 - sk("hot2") <= 22, s"hot2 bound (parts=$parts): $sk")
    }
  }

  test("weighted updates equal exploded repetition below capacity") {
    val weighted = sketchOf(Seq("x" -> 5, "y" -> 2), k = 8)
    val exploded = sketchOf(
      Seq.fill(5)("x" -> 1) ++ Seq.fill(2)("y" -> 1), k = 8)
    assert(weighted == exploded && weighted == Map("x" -> 5L, "y" -> 2L))
  }

  test("NULL items, NULL weights, and non-positive weights are ignored") {
    val sk = Seq((Some("a"), Some(2)), (None, Some(5)), (Some("b"), None),
      (Some("c"), Some(0)), (Some("c"), Some(-3)), (Some("a"), Some(1)))
      .toDF("w", "rep")
      .agg(heavyHitters(col("w"), col("rep"), 8).as("sk"))
      .collect()(0).getMap[String, Long](0)
    assert(sk == Map("a" -> 3L))
  }

  test("t18 retains every planted hitter with integer-verdict TRUE rows") {
    val out = queries.TextQueries.defs("t18_heavy_hitters")(spark, sfDir).collect()
    assert(out.nonEmpty, "the boosted fixture must produce heavy hitters")
    out.foreach { r =>
      assert(r.getString(0).startsWith("s"), s"unexpected hitter: $r")
      assert(r.getInt(2) == 1 && r.getInt(3) == 1, s"verdict failed: $r")
    }
  }

  test("the sketch aggregate runs with map-side partials (partial merge in plan)") {
    val plan = queries.TextQueries.defs("t18_heavy_hitters")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_heavy_hitters") ||
      plan.contains("merge_graft_heavy_hitters") ||
      "ObjectHashAggregate|SortAggregate".r.findFirstIn(plan).isDefined,
      s"expected a two-phase sketch aggregate:\n$plan")
  }
}
