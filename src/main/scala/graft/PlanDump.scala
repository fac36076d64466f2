package graft

/** Dev utility: print the formatted physical plan of named queries
  * (exchange/stage diagnosis while iterating — see PLANS.md for the
  * audited shapes the bench pins).
  *
  * A leading `--exec` flag runs each query first and prints the
  * POST-EXECUTION adaptive plan instead: AQE's stage cache dedupes
  * identical exchange subtrees only at runtime, so repeated-subplan
  * shapes (q29's four hist derivations) look like N scans statically
  * while executing as one — `ReusedExchange`/`ReusedQueryStage`
  * counts are only meaningful here.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val exec = args.headOption.contains("--exec")
    val names = if (exec) args.tail else args
    val spark = GraftEngine.session(GraftConfig(
      master = "local[8]", appName = "graft-plandump", shufflePartitions = 8))
    // Same planning mode as Bench/Verify (stats-fed CBO) unless
    // GRAFT_NO_CBO is set — the escape hatch for before/after diffs.
    if (!sys.env.contains("GRAFT_NO_CBO"))
      GraftEngine.cachedForDir(spark, sfDir).enableCbo(cached = true)
    names.foreach { name =>
      val df = graft.queries.Queries.all(name)(spark, sfDir)
      val plan =
        if (exec) {
          df.queryExecution.executedPlan.executeCollect()
          df.queryExecution.executedPlan.toString
        } else GraftEngine.explainPlan(df)
      println(s"==== $name ====")
      println(plan)
      def n(re: String) = re.r.findAllIn(plan).length
      // a FileScan printed INSIDE an InMemoryRelation description is
      // the cached plan's provenance, not an execution — subtract one
      // description per InMemoryTableScan consumer and count the
      // cache reads separately (the relation's child runs once, at
      // first materialization)
      println(s"[plandump] $name exchanges=${n("Exchange")}" +
        (if (exec) s" reused=${n("ReusedExchange") + n("ReusedQueryStage")}" +
          s" scans=${math.max(0, n("Scan parquet") - n("InMemoryTableScan"))}" +
          s" cachedReads=${n("InMemoryTableScan")}" else ""))
    }
    spark.stop()
  }
}
