package graft

/** A/B probe (round-17): the heavy h-suite queries on a CO-BUCKETED
  * table layout vs the plain parquet corpus.
  *
  * h18's standing exemption says "no plan change removes the dominant
  * 60M→15M lineitem aggregate shuffle". That is true PER QUERY — but a
  * deployment owns its table layout, and writing lineitem and orders
  * bucketed by order key is the amortize-the-shuffle-once recipe a
  * real 100 TB warehouse uses (sources/TableLayout: two tables
  * bucketed on the same key with the same bucket count join with no
  * exchange, and a groupBy on the bucket key is exchange-free). This
  * probe measures exactly that: h18/h21/h04 on the plain corpus, then
  * the same SQL with the lineitem/orders views repointed at bucketed
  * catalog tables (stats attached via Profile.analyzeCatalogTable so
  * both layouts plan CBO-fed), reporting per-query seconds and the
  * exchange count of the executed plan. SCALE.md records the numbers.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.BucketedLayoutProbe [query ...]"
  *        GRAFT_BUCKETS overrides the bucket count (default 32 — one
  *        bucket per local core; a cluster sizes it to executor count).
  */
object BucketedLayoutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata-sf1/sf10")
    val buckets = sys.env.getOrElse("GRAFT_BUCKETS", "32").toInt
    val spark = GraftEngine.session(GraftConfig(
      master = "local[32]", appName = "graft-bucketprobe"))
    GraftEngine.cachedForDir(spark, sfDir).enableCbo(cached = true)
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("h18_large_volume", "h21_waiting_suppliers", "h04_order_priority")

    def run(name: String): (Double, Int) = {
      val fn = graft.queries.Queries.all(name)
      var exchanges = 0
      val ts = (1 to 2).map { _ =>
        val df = fn(spark, sfDir)
        val t0 = System.nanoTime()
        df.queryExecution.executedPlan.executeCollect()
        val sec = (System.nanoTime() - t0) / 1e9
        // AQE: executedPlan AFTER execution is the final adaptive plan
        exchanges = "Exchange (hashpartitioning|SinglePartition|rangepartitioning)".r
          .findAllIn(df.queryExecution.executedPlan.toString).length
        sec
      }
      (ts.min, exchanges)
    }

    val plain = names.map(n => n -> run(n)).toMap

    // build the co-bucketed layout (fresh per JVM: bucket specs are
    // session-catalog metadata; the write itself is the one-time
    // layout cost a deployment amortizes, so it is timed and printed)
    def bucketize(table: String, key: String): String = {
      val bname = s"${table}_bkt$buckets"
      val t0 = System.nanoTime()
      sources.TableLayout.writeBucketed(
        spark.read.parquet(s"$sfDir/$table.parquet"), bname, key, buckets)
      operators.Profile.analyzeCatalogTable(spark, bname)
      println(f"[bucketprobe] layout $bname written+analyzed in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      bname
    }
    val lb = bucketize("lineitem", "l_orderkey")
    val ob = bucketize("orders", "o_orderkey")
    spark.table(lb).createOrReplaceTempView("lineitem")
    spark.table(ob).createOrReplaceTempView("orders")

    for (name <- names) {
      val (ps, pe) = plain(name)
      val (bs, be) = run(name)
      println(f"[bucketprobe] $name plain=$ps%.2fs/$pe%dex bucketed=$bs%.2fs/$be%dex")
    }
    spark.stop()
  }
}
