package graft

import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Statistics-fed cost-based planning (round-8 verdict item 5): the
  * x10 profiler's numbers reach the session catalog and change join
  * shape — the Spark-native counterpart of the reference's
  * JoinReordering pass (optimizer.rs:9).
  */
class CboSpec extends SparkSpec {

  /** Leaf catalog-table names under `plan`, left-to-right. */
  private def leafTables(plan: LogicalPlan): Seq[String] =
    plan.collectLeaves().flatMap {
      case lr: LogicalRelation => lr.catalogTable.map(_.identifier.table)
      case _ => None
    }

  /** The DEEPEST join's leaf tables — the pair the optimizer chose to
    * join first. */
  private def firstJoined(plan: LogicalPlan): Set[String] = {
    val joins = plan.collect { case j: Join => j }
    assert(joins.nonEmpty, s"no join in:\n$plan")
    leafTables(joins.last).toSet
  }

  private def withCbo[A](enabled: Boolean)(body: => A): A = {
    val prev = (spark.conf.get("spark.sql.cbo.enabled", "false"),
      spark.conf.get("spark.sql.cbo.joinReorder.enabled", "false"))
    spark.conf.set("spark.sql.cbo.enabled", enabled.toString)
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", enabled.toString)
    try body
    finally {
      spark.conf.set("spark.sql.cbo.enabled", prev._1)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", prev._2)
    }
  }

  // a 3-table star written in the WORST syntactic order: the two big
  // tables (orders 1.5k rows, customer 150 at sf0.01) join first, the
  // 25-row nation last — cost-based reorder should instead join the
  // dimensions first and leave the fact for the smallest intermediate
  private val q =
    """SELECT count(*) AS n
      |FROM graft_cat_orders o
      |JOIN graft_cat_customer c ON o.o_custkey = c.c_custkey
      |JOIN graft_cat_nation n ON c.c_nationkey = n.n_nationkey""".stripMargin

  private def feed(): Unit =
    Seq("orders", "customer", "nation").foreach { t =>
      graft.operators.Profile.feedSessionCatalog(
        spark, s"graft_cat_$t", s"$sfDir/$t.parquet")
    }

  test("profiler stats reach the catalog: row counts and NDVs are visible to the planner") {
    feed()
    val rel = spark.table("graft_cat_customer").queryExecution
      .optimizedPlan.collect { case lr: LogicalRelation => lr }.head
    val stats = rel.catalogTable.get.stats
    assert(stats.isDefined, "no CatalogStatistics on the fed table")
    val exact = spark.read.parquet(s"$sfDir/customer.parquet").count()
    assert(stats.get.rowCount.contains(BigInt(exact)))
    val ndv = stats.get.colStats("c_custkey").distinctCount.get
    // HLL at 1% rsd on a unique key: within 5% of exact
    assert((ndv - exact).abs <= exact / 20)
  }

  test("a 3-table join changes shape with stats present vs absent") {
    feed()
    val without = withCbo(enabled = false)(
      firstJoined(spark.sql(q).queryExecution.optimizedPlan))
    val withStats = withCbo(enabled = true)(
      firstJoined(spark.sql(q).queryExecution.optimizedPlan))
    // syntactic order joins the fact table first
    assert(without == Set("graft_cat_orders", "graft_cat_customer"), without)
    // cost-based reorder starts from the smaller pair instead
    assert(withStats != without,
      s"stats did not change the join order: still $withStats")
    assert(withStats.contains("graft_cat_nation"),
      s"expected the 25-row dimension in the first join, got $withStats")
    // and the reorder must not change the answer
    val n = withCbo(enabled = true)(spark.sql(q).collect()(0).getLong(0))
    assert(n == withCbo(enabled = false)(spark.sql(q).collect()(0).getLong(0)))
  }

  test("engine.enableCbo repoints views at stats-backed catalog relations") {
    val e = GraftEngine.cachedForDir(spark, sfDir)
    e.enableCbo()
    try {
      val plan = e.sql("SELECT * FROM nation").queryExecution.optimizedPlan
      val rel = plan.collect { case lr: LogicalRelation => lr }.head
      assert(rel.catalogTable.exists(_.stats.exists(_.rowCount.isDefined)),
        s"nation view is not backed by a stats-fed catalog table:\n$plan")
      // events keeps its ts normalization through the catalog swap
      assert(e.table("events").schema("ts").dataType.typeName.startsWith("timestamp"))
    } finally {
      // restore the plain temp views (session + dir-engine cache are
      // shared across suites) and the conf defaults
      Tables.all.foreach(t => e.loadTable(t, s"$sfDir/$t.parquet"))
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    }
  }
}
