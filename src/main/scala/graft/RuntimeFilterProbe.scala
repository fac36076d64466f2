package graft

/** A/B probe: does Catalyst's runtime bloom-filter injection
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) pay on the
  * h-suite's semi-join shapes at sf10? RuntimeFilterSpec proves the
  * rule ENGAGES; this measures whether engaging it is a win at bench
  * scale before the conf is promoted into the production session
  * (the measurement SCALE.md cites either way).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.RuntimeFilterProbe [query ...]"
  */
object RuntimeFilterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata-sf1/sf10")
    val spark = GraftEngine.session(GraftConfig(
      master = "local[32]", appName = "graft-rfprobe", shufflePartitions = 32))
    GraftEngine.cachedForDir(spark, sfDir).enableCbo(cached = true)
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("h04_order_priority", "h18_large_volume", "h21_waiting_suppliers")
    def time(name: String): Double = {
      val fn = graft.queries.Queries.all(name)
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.executedPlan.executeCollect()
        (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }
    for (name <- names) {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      time(name) // warm (I/O cache, codegen)
      val off = time(name)
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // the 10 GB default application-side floor is cluster-tuned; at
      // probe scale the SHAPE is what matters, so waive it
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val on = time(name)
      val injected = graft.queries.Queries.all(name)(spark, sfDir)
        .queryExecution.optimizedPlan.toString.contains("might_contain")
      // creation-side threshold raised: the stat-fed estimates are
      // DECOMPRESSED rowCount × width (h04's filtered orders quarter
      // estimates 43 MB at sf10), so the 10 MB file-size-tuned default
      // vetoes every h-suite creation side. 256 MB admits a
      // quarter-of-orders bloom build while still fencing out
      // fact-sized creation sides at this corpus.
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "256m")
      val onWide = time(name)
      val injWide = graft.queries.Queries.all(name)(spark, sfDir)
        .queryExecution.optimizedPlan.toString.contains("might_contain")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10m")
      println(f"[rfprobe] $name off=$off%.2fs on=$on%.2fs injected=$injected " +
        f"onWide=$onWide%.2fs injectedWide=$injWide")
    }
    spark.stop()
  }
}
