package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: one JSON line with per-query wall times.
  *
  * Methodology (fixes from round-1 verdict):
  *  - execution via the `noop` sink, so every declared operator runs —
  *    `.count()` lets Catalyst prune projections and eliminate sorts;
  *  - one untimed warmup pass (JVM JIT + codegen + parquet footer cache)
  *    before the timed pass, for cross-round comparability;
  *  - a failed query reports `-1` (explicit error marker), never a
  *    fast-looking elapsed time.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftEngine.session(GraftConfig(
      master = s"local[$cpus]", appName = "graft-bench", shufflePartitions = cpus))

    def runOnce(name: String): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          None
      }
    }

    // optional args narrow the run to named queries (dev iteration);
    // the driver invokes with no args → full suite, unchanged
    val names =
      if (args.nonEmpty) args.toSeq.sorted
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach(runOnce) // warmup, untimed
    // two timed passes, keep the min: damps JIT/GC run-to-run noise so
    // cross-round comparisons track plan changes, not scheduler luck
    val results = names.map { n =>
      (runOnce(n), runOnce(n)) match {
        case (Some(a), Some(b)) => n -> math.min(a, b)
        case _ => n -> -1.0
      }
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.count(_._2 < 0)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    // stdout capture has truncated past rounds' per-query tails (the
    // driver kept only 66/106 timings in BENCH_r04.json) — land the
    // full line in a file too so the history is durable
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json"))
    java.nio.file.Files.write(out,
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
