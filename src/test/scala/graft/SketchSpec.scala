package graft

import graft.queries.{CoreQueries, Ops}
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {

  test("q19 ships TRUE sketch verdicts and exact columns match a direct computation") {
    val rows = CoreQueries.defs("q19_sketches")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = Ops.events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("users"), count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == exact.keySet && rows.nonEmpty)
    exact.foreach { case (et, ex) =>
      val r = rows(et)
      assert(r.getAs[Long]("n_users") == ex.getAs[Long]("users"))
      assert(r.getAs[Long]("cnt") == ex.getAs[Long]("cnt"))
      assert(r.getAs[Boolean]("users_ok"), s"$et HLL estimate outside 15% budget")
      assert(r.getAs[Boolean]("median_ok"), s"$et approx median rank outside ±1% band")
    }
  }

  test("q19 underlying sketches are genuinely tight (5%), not just inside the verdict budget") {
    val e = Ops.events(spark, sfDir)
    val approx = e.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("au"),
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("am"))
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = e.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("users"),
        expr("percentile(value, 0.5)").as("median"))
      .collect().map(r => r.getString(0) -> r).toMap
    exact.foreach { case (et, ex) =>
      val users = ex.getAs[Long]("users").toDouble
      val au = approx(et).getAs[Long]("au").toDouble
      assert(math.abs(au - users) / users <= 0.05,
        s"$et HLL off by ${math.abs(au - users) / users}")
      val med = ex.getAs[Double]("median")
      val am = approx(et).getAs[Double]("am")
      assert(math.abs(am - med) <= math.max(1.0, math.abs(med) * 0.05),
        s"$et approx median $am vs exact $med")
    }
  }

  test("q42 unioned per-day sketches carry a TRUE verdict and exact columns") {
    val row = CoreQueries.defs("q42_sketch_union")(spark, sfDir).head()
    val e = Ops.events(spark, sfDir)
    assert(row.getAs[Long]("n_users") ==
      e.agg(countDistinct(col("user_id"))).head().getLong(0))
    assert(row.getAs[Long]("n_events") == e.count())
    assert(row.getAs[Boolean]("union_ok"), "sketch union estimate outside 5% budget")
  }

  test("sketch aggregation is a single partial-aggregated shuffle") {
    val df = CoreQueries.defs("q19_sketches")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString()
    // partial_approx_count_distinct on the map side: constant-size
    // sketch buffers travel the exchange, not rows
    assert(plan.contains("partial_"), s"no partial aggregation:\n$plan")
  }
}
