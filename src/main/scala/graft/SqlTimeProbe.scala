package graft

/** Generic SQL A/B timing probe against the engine's stats-fed session
  * (the Bench planning mode): each arg is a path to a .sql file; the
  * probe times each text (1 warm + 2 timed, min) on
  * SPARK_GRAFT_SF_DIR and prints one line per file. Used to measure
  * candidate oracle-symmetric rewrites BEFORE committing them (the
  * h04/h18/h21 adjudication of round 16 — SCALE.md cites the runs).
  */
object SqlTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata-sf1/sf10")
    val spark = GraftEngine.session(GraftConfig(
      master = "local[32]", appName = "graft-sqlprobe", shufflePartitions = 32))
    val engine = GraftEngine.cachedForDir(spark, sfDir)
    engine.enableCbo(cached = true)
    for (path <- args) {
      val sql = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        engine.sql(sql).queryExecution.executedPlan.executeCollect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[sqlprobe] $path warm=${ts.head}%.2f min=${ts.tail.min}%.2f")
      if (sys.env.contains("GRAFT_PROBE_PLAN")) {
        val qe = engine.sql(sql).queryExecution
        qe.executedPlan.executeCollect()
        println(qe.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
