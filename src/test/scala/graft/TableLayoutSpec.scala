package graft

import graft.sources.TableLayout
import org.apache.spark.sql.functions._

class TableLayoutSpec extends SparkSpec {

  test("co-bucketed tables join with zero exchanges") {
    // the in-memory catalog forgets tables between sessions but their
    // warehouse directories persist — clear both before writing
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
    TableLayout.writeBucketed(o, "orders_b", "o_orderkey", 4)
    TableLayout.writeBucketed(
      l.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b", "o_orderkey", 4)
    val joined = TableLayout.readBucketed(spark, "orders_b")
      .join(TableLayout.readBucketed(spark, "lineitem_b"), "o_orderkey")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
    // the join needs NO shuffle: both sides arrive pre-hashed on the key.
    // (the groupBy on a different key still exchanges once.)
    val plan = joined.queryExecution.executedPlan.toString()
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"co-bucketed join should not shuffle its inputs:\n$plan")
    // and the result matches the plain (shuffling) join
    val plain = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
    assert(joined.orderBy("o_orderstatus").collect().toSeq ==
      plain.orderBy("o_orderstatus").collect().toSeq)
  }

  test("global-sorted write is range-partitioned: files hold disjoint ordered key ranges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sorted").toString + "/out"
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    TableLayout.writeGlobalSorted(o, dir, "o_totalprice", 4)
    // every parquet part file covers a key range disjoint from the others
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    val ranges = parts.toSeq.map { f =>
      val df = spark.read.parquet(f.getAbsolutePath)
      val r = df.agg(min("o_totalprice"), max("o_totalprice")).head()
      (r.getDouble(0), r.getDouble(1))
    }.sortBy(_._1)
    assert(ranges.size > 1, "expected multiple range files")
    ranges.zip(ranges.tail).foreach { case ((_, hi), (lo2, _)) =>
      assert(hi <= lo2, s"file ranges overlap: $ranges")
    }
    // nothing lost in the re-layout
    assert(spark.read.parquet(dir).count() == o.count())
  }

  test("d09's stored LSH index: bucketed by bh, the ingest semi-join never shuffles the index") {
    import graft.operators.Dedup
    spark.sql("DROP TABLE IF EXISTS lsh_index_b")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "lsh_index_b")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val history = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    TableLayout.writeBucketed(Dedup.bandedBuckets(history), "lsh_index_b", "bh", 4)
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // at corpus scale the index outgrows broadcast; force that regime
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val kept = Dedup.incrementalKeep(spark.table("lsh_index_b"), batch)
      val plan = kept.queryExecution.executedPlan.toString()
      // the index scan reports its bucket layout and feeds the semi-join
      // without an Exchange above it (single-key join = bucket key)
      assert(plan.contains("Bucketed: true"), s"index not read as bucketed:\n$plan")
      // walk the ASCII plan tree from the index scan up to its enclosing
      // join: no Exchange may sit on that path
      val lines = plan.linesIterator.toVector
      def indent(s: String) = s.indexWhere(c => !" :+-".contains(c))
      var i = lines.indexWhere(_.contains("lsh_index_b["))
      assert(i >= 0, s"no index scan in plan:\n$plan")
      var ind = indent(lines(i))
      var hitJoin = false
      var sawExchange = false
      while (i > 0 && !hitJoin) {
        i -= 1
        val li = indent(lines(i))
        if (li >= 0 && li < ind) {
          ind = li
          if (lines(i).contains("Join")) hitJoin = true
          else if (lines(i).contains("Exchange")) sawExchange = true
        }
      }
      assert(hitJoin && !sawExchange, s"index side shuffled before the join:\n$plan")
      // same admissions as the unbucketed path
      val plain = Dedup.incrementalKeep(Dedup.bandedBuckets(history), batch)
        .collect().map(_.getLong(0)).toSet
      assert(kept.collect().map(_.getLong(0)).toSet == plain)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("partition-pruned scan reads only the predicate's directories") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val e = graft.queries.Ops.events(spark, sfDir)
    TableLayout.writePartitioned(e, dir, "event_type")
    val pruned = spark.read.parquet(dir).filter(col("event_type") === "click")
    val scan = pruned.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters") &&
      scan.contains("event_type"), s"no partition pruning in scan:\n$scan")
    assert(pruned.count() == e.filter(col("event_type") === "click").count())
    // directory layout: one subdir per event_type value
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(subdirs.forall(_.startsWith("event_type=")))
  }
}
