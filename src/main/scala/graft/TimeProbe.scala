package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Dev utility (round 17): per-query cost attribution while iterating.
  *
  * For each named query, replicates the bench methodology (untimed warm
  * pass + timed passes via the noop sink) and attributes where the time
  * goes: DataFrame construction, analysis+optimization+physical planning
  * (`executedPlan` forcing), and execution — plus Spark job / stage /
  * task counts from a listener, so "this query pays N jobs of fixed
  * overhead" is a measured number instead of a guess.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.TimeProbe q29_percentiles t19_bpe_train"
  * Flags: --cpus=N (default 32), --passes=N (default 2), --no-cbo.
  */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = args.collectFirst { case a if a.startsWith("--cpus=") => a.drop(7).toInt }.getOrElse(32)
    val passes = args.collectFirst { case a if a.startsWith("--passes=") => a.drop(9).toInt }.getOrElse(2)
    val noCbo = args.contains("--no-cbo")
    // --set spark.x.y=v : applied to the session before any query runs
    val confs = args.collect { case a if a.startsWith("--set=") =>
      val kv = a.drop(6).split("=", 2); (kv(0), kv(1)) }
    val names = args.filterNot(_.startsWith("--")).toSeq
    val spark = GraftEngine.session(GraftConfig(
      master = s"local[$cpus]", appName = "graft-timeprobe", shufflePartitions = cpus))
    confs.foreach { case (k, v) => spark.conf.set(k, v) }

    // artifact prep as the bench does (untimed)
    queries.MultimodalQueries.ensureMediaStore(spark, sfDir)
    queries.MultimodalQueries.ensureDecodedFeatures(spark, sfDir)
    queries.SimilarityQueries.ensureAnnIndex(spark, sfDir)
    queries.DedupQueries.ensureClusterIndex(spark, sfDir)
    queries.SimilarityQueries.ensurePqIndex(spark, sfDir)
    queries.DedupQueries.ensureWindowIndex(spark, sfDir)
    queries.SimilarityQueries.ensureSemIndex(spark, sfDir)
    queries.DedupQueries.ensureBandIndex(spark, sfDir)
    queries.DedupQueries.ensureSimhashIndex(spark, sfDir)
    queries.DedupQueries.ensureShingleSets(spark, sfDir)
    if (!noCbo) GraftEngine.cachedForDir(spark, sfDir).enableCbo(cached = true)

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = stages += 1
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = tasks += 1
    }
    spark.sparkContext.addSparkListener(listener)

    // listenerBus is private[spark]; same reflective drain as
    // EventAnalyticsSpec's q60 zero-jobs assertion
    def drainBus(): Unit = {
      val bus = classOf[org.apache.spark.SparkContext]
        .getMethod("listenerBus").invoke(spark.sparkContext)
      bus.getClass.getMethod("waitUntilEmpty", classOf[Long])
        .invoke(bus, java.lang.Long.valueOf(10000L))
    }

    def release(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(org.apache.spark.rdd.GraftRddIntrospect.isPendingLocalCheckpoint)
        .foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
    }

    names.foreach { name =>
      val q = SparkEntry.queries(name)
      // warm (untimed)
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      release()
      (1 to passes).foreach { i =>
        drainBus()
        jobs = 0; stages = 0; tasks = 0
        val t0 = System.nanoTime()
        val df = q(spark, sfDir)
        val t1 = System.nanoTime()
        drainBus()
        val (bJobs, bStages, bTasks) = (jobs, stages, tasks)
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t2 = System.nanoTime()
        drainBus()
        jobs = 0; stages = 0; tasks = 0
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        drainBus()
        release()
        def ms(a: Long, b: Long) = (b - a) / 1e6
        println(f"[timeprobe] $name pass$i total=${ms(t0, t3)}%.0fms " +
          f"build=${ms(t0, t1)}%.0fms plan=${ms(t1, t2)}%.0fms exec=${ms(t2, t3)}%.0fms " +
          s"jobs=$jobs stages=$stages tasks=$tasks " +
          s"buildJobs=$bJobs buildStages=$bStages buildTasks=$bTasks")
      }
    }
    spark.stop()
  }
}
