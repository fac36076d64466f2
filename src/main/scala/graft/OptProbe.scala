package graft

import org.apache.spark.sql.functions._

/** Round-17 scratch probe: A/B the adaptive scan fan-out
  * ([[graft.queries.Ops.fanScan]]) on the SQL surface — base catalog
  * views vs fan-wrapped views — across the h-suite and core SQL
  * aggregates, plus exchange-count sanity per plan.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftEngine.session(GraftConfig(
      master = s"local[$cpus]", appName = "graft-optprobe", shufflePartitions = cpus))
    val eng = GraftEngine.cachedForDir(spark, sfDir)
    eng.enableCbo(cached = true)

    def time(label: String, n: Int)(body: => Unit): Unit = {
      body // warm
      val secs = (1 to n).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[optprobe] $label min=${secs.min}%.3f passes=${secs.map(s => f"$s%.3f").mkString(",")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val hNames = Seq("h01_pricing_summary", "h03_shipping_priority",
      "h05_local_supplier", "h06_forecast_revenue", "h08_market_share",
      "h09_product_profit", "h18_large_volume", "h21_waiting_suppliers")

    def runSuite(tag: String): Unit = hNames.foreach { n =>
      time(f"$tag%-5s $n", 3)(noop(spark.sql(queries.TpchQueries.sql(n))))
    }

    def exchanges(n: String): Int =
      "Exchange".r.findAllIn(GraftEngine.explainPlan(
        spark.sql(queries.TpchQueries.sql(n)))).length

    println("[optprobe] ==== BASE views ====")
    hNames.foreach(n => println(s"[optprobe] exch base $n = ${exchanges(n)}"))
    runSuite("base")

    // fan-wrap the two fact tables' views
    Seq("lineitem", "orders").foreach { t =>
      queries.Ops.fanScan(spark.table(t)).createOrReplaceTempView(t)
    }
    println("[optprobe] ==== FAN views ====")
    hNames.foreach(n => println(s"[optprobe] exch fan  $n = ${exchanges(n)}"))
    runSuite("fan")

    // restore
    eng.enableCbo(cached = true)
    spark.stop()
  }
}
