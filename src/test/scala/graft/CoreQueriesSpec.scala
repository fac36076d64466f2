package graft

import graft.queries.CoreQueries
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

class CoreQueriesSpec extends SparkSpec {

  test("every core query runs and returns rows on sf0.001") {
    CoreQueries.defs.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("q03_agg produces the 6 returnflag/linestatus groups with exact sums") {
    val rows = CoreQueries.defs("q03_agg")(spark, sfDir).collect()
    assert(rows.length >= 3)
    val cols = CoreQueries.defs("q03_agg")(spark, sfDir).columns.toSeq
    assert(cols == Seq("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
      "sum_disc_price", "avg_qty", "avg_price", "count_order"))
  }

  test("filter and projection are pushed down to the parquet scan (q02)") {
    val df = CoreQueries.defs("q02_filter")(spark, sfDir)
    val scan = df.queryExecution.executedPlan.toString()
    assert(scan.contains("PushedFilters: ["), "no pushed filters in scan")
    assert(scan.contains("l_shipdate"), "shipdate filter not pushed")
    // projection pruning: scan must not read all 11 lineitem columns
    assert(!scan.contains("l_extendedprice"), "column pruning failed: unneeded column read")
  }

  test("small filtered dimension is broadcast (q05)") {
    val df = CoreQueries.defs("q05_join_inner")(spark, sfDir)
    assert(df.queryExecution.executedPlan.toString().contains("BroadcastHashJoin"))
  }

  test("merge hint yields a sort-merge join (q08)") {
    val df = CoreQueries.defs("q08_join_sortmerge")(spark, sfDir)
    assert(df.queryExecution.executedPlan.toString().contains("SortMergeJoin"))
  }

  test("topk plans as TakeOrderedAndProject, not a global sort (q09)") {
    val df = CoreQueries.defs("q09_topk")(spark, sfDir)
    assert(df.queryExecution.executedPlan.toString().contains("TakeOrderedAndProject"))
  }

  test("GraftEngine catalog registers and lists tables") {
    val e = new GraftEngine(spark)
    e.loadTable("nation_t", s"$sfDir/nation.parquet")
    e.loadTable("region_t", s"$sfDir/region.parquet")
    assert(e.listTables == Seq("nation_t", "region_t"))
    assert(e.sql("SELECT COUNT(*) AS c FROM nation_t").head().getLong(0) == 25L)
  }

  test("whole-stage codegen covers the aggregate pipeline (q03)") {
    val df = CoreQueries.defs("q03_agg")(spark, sfDir)
    df.collect() // materialize so AQE finalizes the physical plan
    // codegen'd operators print as "*(n) Op" in the physical plan tree
    assert(df.queryExecution.executedPlan.toString().contains("*("))
  }
}
