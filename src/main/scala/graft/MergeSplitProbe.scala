package graft

/** Dev utility: split x07/x08's cost into the two PHYSICAL snapshot
  * writes (the manifest-table build + the COW merge commit) versus the
  * SQL query over the committed snapshot — the evidence behind their
  * PLANS.md weak-list exemption (the DuckDB oracle answers the same
  * question declaratively and never writes anything, so the
  * cross-engine ratio compares a write+read pipeline against a read).
  *
  * Bench discipline per phase: one untimed warmup, two timed passes,
  * min kept. One JSON line per measurement.
  */
object MergeSplitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftEngine.session(GraftConfig(
      master = "local[32]", appName = "graft-merge-split", shufflePartitions = 32))
    val e = GraftEngine.cachedForDir(spark, sfDir)

    def time(name: String)(body: => Unit): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      once()
      val best = math.min(once(), once())
      println(f"""{"probe":"$name","sec":$best%.3f}""")
    }

    // x07: write = manifest build + COW upsert (two snapshot commits);
    // query = the segment rollup over the committed files
    time("x07_write")(
      queries.SqlSurfaceQueries.mergedCustomerView(e, "graft_probe_merged"))
    time("x07_query")(e.sql(
      """SELECT c_mktsegment, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS total_bal
        |FROM graft_probe_merged
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
      .write.format("noop").mode("overwrite").save())

    // x08: same write phase plus the v0 snapshot registration; query =
    // the change-classification join between the two snapshots
    time("x08_write")({
      queries.SqlSurfaceQueries.mergedCustomerView(e, "graft_probe_tt")
      e.registerManifestVersion("graft_probe_tt", 0)
    })
    time("x08_query")(e.sql(
      """SELECT CASE WHEN o.c_custkey IS NULL THEN 'inserted'
        |            WHEN n.c_acctbal <> o.c_acctbal THEN 'updated'
        |            ELSE 'unchanged' END AS change,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(n.c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS total_bal
        |FROM graft_probe_tt n
        |LEFT JOIN graft_probe_tt_v0 o ON o.c_custkey = n.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
