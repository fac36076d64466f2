package graft

import graft.queries.{CoreQueries, Ops}
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {

  test("q19 sketch aggregates are within tolerance of exact values") {
    val approx = CoreQueries.defs("q19_sketches")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = Ops.events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("users"),
        expr("percentile(value, 0.5)").as("median"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (et, ex) =>
      val ap = approx(et)
      val users = ex.getAs[Long]("users").toDouble
      val apUsers = ap.getAs[Long]("approx_users").toDouble
      assert(math.abs(apUsers - users) / users <= 0.05,
        s"$et HLL off by ${math.abs(apUsers - users) / users}")
      val med = ex.getAs[Double]("median")
      val apMed = ap.getAs[Double]("approx_median")
      assert(math.abs(apMed - med) <= math.max(1.0, math.abs(med) * 0.05),
        s"$et approx median $apMed vs exact $med")
    }
  }

  test("q42 unioned per-day sketches estimate the global distinct within tolerance") {
    val row = CoreQueries.defs("q42_sketch_union")(spark, sfDir).head()
    val exact = Ops.events(spark, sfDir)
      .agg(countDistinct(col("user_id"))).head().getLong(0).toDouble
    val approx = row.getAs[Long]("approx_users_total").toDouble
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"sketch union estimate $approx vs exact $exact")
    assert(row.getAs[Long]("n_events") == Ops.events(spark, sfDir).count())
  }

  test("sketch aggregation is a single partial-aggregated shuffle") {
    val df = CoreQueries.defs("q19_sketches")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString()
    // partial_approx_count_distinct on the map side: constant-size
    // sketch buffers travel the exchange, not rows
    assert(plan.contains("partial_"), s"no partial aggregation:\n$plan")
  }
}
