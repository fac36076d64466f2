package graft

import org.apache.spark.sql.functions._
import graft.sources.TableLayout

/** Manifest-lifecycle scale probe: drives the MERGE/vacuum lifecycle
  * against a replicated orders table and prints one JSON line per
  * measurement — the SCALE.md evidence that (a) COW merge cost is the
  * rewrite, not the match (the anti-join broadcasts the batch), and
  * (b) table storage is BOUNDED by vacuum retention, not by update
  * count — the failure mode a 100 TB table accreting daily merges
  * actually dies of.
  *
  * Usage: `sbt "runMain graft.LifecycleProbe [factor]"` (default 20).
  */
object LifecycleProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftEngine.session(GraftConfig(master = "local[32]", appName = "graft-lifecycle"))

    val base = (0 until factor).map { i =>
      spark.read.parquet(s"$sfDir/orders.parquet")
        .withColumn("o_orderkey", col("o_orderkey") + lit(i * 10000000L))
    }.reduce(_ unionAll _)
    val table = java.nio.file.Files.createTempDirectory("graft_lifecycle_probe")
      .toString + "/orders"

    def dirBytes: Long = {
      val p = new org.apache.hadoop.fs.Path(table)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      var b = 0L
      while (it.hasNext) b += it.next().getLen
      b
    }
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    val n = base.count()
    val (_, tWrite) = time(TableLayout.writeManifested(base, table))
    println(f"""{"op":"write","rows":$n,"sec":$tWrite%.2f,"bytes":$dirBytes}""")

    // five merge rounds: each updates 10%% of keys and inserts 2%% new —
    // the daily-ingest shape; COW cost should be flat per round (the
    // rewrite), storage should grow by one snapshot per round
    (1 to 5).foreach { r =>
      val updates = base.filter(col("o_orderkey") % 10 === r)
        .withColumn("o_totalprice", col("o_totalprice") * lit(1.01))
      val inserts = base.filter(col("o_orderkey") % 50 === r)
        .withColumn("o_orderkey", col("o_orderkey") + lit(1000000000L) * r)
      val batch = updates.unionByName(inserts)
      val bn = batch.count()
      val (_, tMerge) = time(
        TableLayout.upsertManifested(spark, table, batch, Seq("o_orderkey")))
      val snaps = TableLayout.snapshots(spark, table).size
      println(f"""{"op":"merge","round":$r,"batch_rows":$bn,"sec":$tMerge%.2f,"snapshots":$snaps,"bytes":$dirBytes}""")
    }

    val (tt, tTravel) = time(TableLayout.readManifestedAt(spark, table, 0).count())
    println(f"""{"op":"time_travel_v0","rows":$tt,"sec":$tTravel%.2f}""")

    val preVacuum = dirBytes
    val (removed, tVac) = time(TableLayout.vacuumManifested(spark, table, keep = 2))
    val cur = TableLayout.readManifested(spark, table).count()
    println(f"""{"op":"vacuum","removed":$removed,"sec":$tVac%.2f,"bytes_before":$preVacuum,"bytes_after":$dirBytes,"current_rows":$cur}""")

    // partition-scoped merge vs the COW baseline above: a range-
    // bucketed table takes a CLUSTERED batch (contiguous keys — the
    // late-arriving/backfill shape) by rewriting only the touched
    // buckets; a key-UNIFORM batch (every bucket hit) degrades to the
    // COW cost — both measured
    val table2 = java.nio.file.Files.createTempDirectory("graft_lifecycle_probe")
      .toString + "/orders_bucketed"
    val (_, tW2) = time(
      TableLayout.writeManifestedBucketed(base, table2, "o_orderkey", width = 250000L))
    println(f"""{"op":"write_bucketed","rows":$n,"sec":$tW2%.2f}""")

    val clustered = base.filter(col("o_orderkey") < 60000L)
      .withColumn("o_totalprice", col("o_totalprice") * lit(1.01))
    val cn = clustered.count()
    val (_, tScoped) = time(
      TableLayout.upsertManifestedBucketed(spark, table2, clustered))
    println(f"""{"op":"merge_scoped_clustered","batch_rows":$cn,"sec":$tScoped%.2f}""")

    val uniform = base.filter(col("o_orderkey") % 10 === 7)
      .withColumn("o_totalprice", col("o_totalprice") * lit(1.01))
    val un = uniform.count()
    val (_, tUniform) = time(
      TableLayout.upsertManifestedBucketed(spark, table2, uniform))
    println(f"""{"op":"merge_scoped_uniform","batch_rows":$un,"sec":$tUniform%.2f}""")
    spark.stop()
  }
}
