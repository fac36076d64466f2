package graft

/** Dev utility: dump one query's result parquet (`/tmp/probe/<name>`) and
  * its oracle SQL (`/tmp/probe/<name>.sql`) for a quick single-query
  * DuckDB comparison while iterating — the full gate is `graft.Verify` +
  * `scripts/selfcheck.py`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftEngine.session(GraftConfig(
      master = "local[8]", appName = "graft-probe", shufflePartitions = 8))
    args.foreach { name =>
      graft.queries.Queries.all(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"/tmp/probe/$name")
      graft.queries.Queries.oracles.get(name).foreach(sql =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"/tmp/probe/$name.sql"), sql))
      println(s"[probe] wrote $name")
    }
    spark.stop()
  }
}
