package graft

import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicBoolean, AtomicReference}

import org.apache.spark.sql.functions._
import graft.sources.TableLayout

/** Snapshot lifecycle of manifest tables (round-5 extension of the
  * round-4 atomic-commit work): MERGE/upsert, DELETE, time travel over
  * the commit log, and vacuum retention — the minimal lakehouse table
  * lifecycle on top of the same one-rename commit protocol.
  */
class ManifestLifecycleSpec extends SparkSpec {

  private def freshTable(): String =
    Files.createTempDirectory("graft_lifecycle").toString + "/t"

  test("upsert replaces matched rows, inserts unmatched, preserves the rest") {
    import spark.implicits._
    val table = freshTable()
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "tag", "v")
    TableLayout.writeManifested(base, table)

    val updates = Seq((2L, "B", 99.0), (4L, "d", 40.0)).toDF("id", "tag", "v")
    TableLayout.upsertManifested(spark, table, updates, Seq("id"))

    val got = TableLayout.readManifested(spark, table)
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("upsert rejects a schema mismatch with a clear error") {
    import spark.implicits._
    val table = freshTable()
    TableLayout.writeManifested(Seq((1L, "a")).toDF("id", "tag"), table)
    val e = intercept[IllegalArgumentException] {
      TableLayout.upsertManifested(spark, table,
        Seq((1L, 2.0)).toDF("id", "other"), Seq("id"))
    }
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("delete removes predicate-true rows only (NULL predicate keeps the row) and reports the count") {
    import spark.implicits._
    val table = freshTable()
    val base = Seq((1L, Some(5.0)), (2L, None), (3L, Some(50.0))).toDF("id", "v")
    TableLayout.writeManifested(base, table)
    // v > 10 is NULL for id=2 — SQL DELETE semantics keep it
    val n = TableLayout.deleteManifested(spark, table, col("v") > 10.0)
    assert(n == 1L)
    assert(TableLayout.readManifested(spark, table)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("time travel: every snapshot stays readable; -1 is current") {
    import spark.implicits._
    val table = freshTable()
    TableLayout.writeManifested(Seq((1L, 10.0)).toDF("id", "v"), table)
    TableLayout.upsertManifested(spark, table,
      Seq((1L, 11.0), (2L, 20.0)).toDF("id", "v"), Seq("id"))
    TableLayout.deleteManifested(spark, table, col("id") === 1L)

    assert(TableLayout.snapshots(spark, table).size == 3)
    def rows(v: Int) = TableLayout.readManifestedAt(spark, table, v)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(rows(0) == Seq((1L, 10.0)))
    assert(rows(1) == Seq((1L, 11.0), (2L, 20.0)))
    assert(rows(2) == Seq((2L, 20.0)))
    assert(rows(-1) == rows(2))
    val e = intercept[IllegalArgumentException] { rows(3) }
    assert(e.getMessage.contains("out of range"))
  }

  test("vacuum deletes superseded dirs, keeps the retained tail readable") {
    import spark.implicits._
    val table = freshTable()
    TableLayout.writeManifested(Seq((1L, 1.0)).toDF("id", "v"), table)
    (2 to 4).foreach { i =>
      TableLayout.upsertManifested(spark, table,
        Seq((i.toLong, i.toDouble)).toDF("id", "v"), Seq("id"))
    }
    val before = TableLayout.snapshots(spark, table)
    assert(before.size == 4)

    val removed = TableLayout.vacuumManifested(spark, table, keep = 2)
    assert(removed == 2)
    val after = TableLayout.snapshots(spark, table)
    assert(after == before.takeRight(2))

    // dropped dirs are gone from disk; retained ones still read
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    before.take(2).foreach { d =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(table, d)), s"$d not vacuumed")
    }
    assert(TableLayout.readManifestedAt(spark, table, 0).count() == 3)
    assert(TableLayout.readManifested(spark, table).count() == 4)
    // vacuumed history is out of range, with the vacuum named
    val e = intercept[IllegalArgumentException] {
      TableLayout.readManifestedAt(spark, table, 2)
    }
    assert(e.getMessage.contains("vacuumed"))
    // idempotent when nothing to drop
    assert(TableLayout.vacuumManifested(spark, table, keep = 2) == 0)
  }

  test("partition-scoped merge rewrites only touched buckets; untouched buckets keep their dirs") {
    import spark.implicits._
    val table = freshTable()
    val base = (0L until 1000L).map(i => (i, 1.0)).toDF("id", "v")
    TableLayout.writeManifestedBucketed(base, table, "id", width = 100L)

    // batch clustered in bucket 2 (ids 250-299) + an insert into new bucket 10
    val updates = ((250L until 300L).map(i => (i, 9.0)) :+ (1050L, 5.0)).toDF("id", "v")
    TableLayout.upsertManifestedBucketed(spark, table, updates)

    // value semantics identical to a full-table merge
    val got = TableLayout.readManifested(spark, table)
      .as[(Long, Double)].collect().toMap
    assert(got.size == 1001)
    assert(got(250L) == 9.0 && got(299L) == 9.0 && got(1050L) == 5.0)
    assert(got(0L) == 1.0 && got(249L) == 1.0 && got(300L) == 1.0 && got(999L) == 1.0)

    // the commit log proves the scoping: bucket 2 moved to a new dir,
    // bucket 0 still points at the ORIGINAL dir in both snapshots
    def mapping(line: String): Map[Long, String] =
      line.split('\t').last.split(',').map { e =>
        val Array(b, d) = e.split('='); b.toLong -> d
      }.toMap
    val Seq(s0, s1) = TableLayout.snapshots(spark, table).map(mapping)
    assert(s1(0L) == s0(0L), "untouched bucket must keep its dir")
    assert(s1(2L) != s0(2L), "touched bucket must move to the merge dir")
    assert(s1(10L) == s1(2L), "inserted bucket lands in the merge dir")

    // and the merge dir holds ONLY the touched buckets on disk
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mergeDirs = fs.listStatus(new org.apache.hadoop.fs.Path(table, s1(2L)))
      .map(_.getPath.getName).filter(_.startsWith("__bucket=")).sorted
    assert(mergeDirs.sameElements(Array("__bucket=10", "__bucket=2")), mergeDirs.mkString(","))
  }

  test("two-writer race, disjoint buckets: both upserts land (rebase)") {
    import spark.implicits._
    val table = freshTable()
    TableLayout.writeManifestedBucketed(
      (0L until 1000L).map(i => (i, 1.0)).toDF("id", "v"), table, "id", width = 100L)
    // writer A stages bucket 2; before A commits, writer B lands a
    // commit to bucket 7 — A must rebase onto B's map, not overwrite it
    TableLayout.upsertManifestedBucketed(spark, table,
      Seq((250L, 9.0)).toDF("id", "v"), dirTag = "",
      beforeCommit = () => TableLayout.upsertManifestedBucketed(spark, table,
        Seq((750L, 8.0)).toDF("id", "v")))
    val got = TableLayout.readManifested(spark, table)
      .as[(Long, Double)].collect().toMap
    assert(got.size == 1000)
    assert(got(250L) == 9.0, "the rebased writer's row must land")
    assert(got(750L) == 8.0, "the rival's row must survive the rebase")
    assert(got(0L) == 1.0 && got(999L) == 1.0)
  }

  test("two-writer race, same bucket: the second committer aborts, no lost update") {
    import spark.implicits._
    val table = freshTable()
    TableLayout.writeManifestedBucketed(
      (0L until 1000L).map(i => (i, 1.0)).toDF("id", "v"), table, "id", width = 100L)
    // both writers rewrite bucket 2: B commits while A is staged, so
    // A's survivor set was computed from a dir that no longer holds
    // bucket 2's truth — A must abort instead of dropping B's row
    intercept[java.util.ConcurrentModificationException] {
      TableLayout.upsertManifestedBucketed(spark, table,
        Seq((250L, 9.0)).toDF("id", "v"), dirTag = "",
        beforeCommit = () => TableLayout.upsertManifestedBucketed(spark, table,
          Seq((255L, 8.0)).toDF("id", "v")))
    }
    val got = TableLayout.readManifested(spark, table)
      .as[(Long, Double)].collect().toMap
    assert(got.size == 1000)
    assert(got(255L) == 8.0, "the committed rival's row must be intact")
    assert(got(250L) == 1.0, "the aborted writer's staged row must NOT be visible")
  }

  test("two-writer race, full-COW merge: any interleaved commit aborts the stale writer") {
    import spark.implicits._
    val table = freshTable()
    TableLayout.writeManifested(
      Seq((1L, "a"), (2L, "b")).toDF("id", "tag"), table)
    // a full-table merge conflicts with EVERY concurrent commit: the
    // rival's insert is not in the stale writer's merged snapshot
    intercept[java.util.ConcurrentModificationException] {
      TableLayout.upsertManifested(spark, table,
        Seq((2L, "B")).toDF("id", "tag"), Seq("id"),
        beforeCommit = () => TableLayout.upsertManifested(spark, table,
          Seq((3L, "c")).toDF("id", "tag"), Seq("id")))
    }
    val got = TableLayout.readManifested(spark, table)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "b", 3L -> "c"),
      "the rival's commit must be the surviving snapshot")
  }

  test("bucketed upsert rejects a schema mismatch before committing anything") {
    import spark.implicits._
    val table = freshTable()
    val base = (0L until 100L).map(i => (i, 1.0)).toDF("id", "v")
    TableLayout.writeManifestedBucketed(base, table, "id", width = 10L)
    val snapsBefore = TableLayout.snapshots(spark, table)
    val bad = Seq((1L, 2.0, "extra")).toDF("id", "v", "w")
    val e = intercept[IllegalArgumentException] {
      TableLayout.upsertManifestedBucketed(spark, table, bad)
    }
    assert(e.getMessage.contains("schema mismatch"))
    // nothing staged or committed: log unchanged, data intact
    assert(TableLayout.snapshots(spark, table) == snapsBefore)
    assert(TableLayout.readManifested(spark, table).count() == 100)
  }

  test("local-FS commits leave no checksum sidecars in the table root") {
    import spark.implicits._
    val table = freshTable()
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
    TableLayout.writeManifested(base, table)
    TableLayout.upsertManifested(spark, table,
      Seq((2L, "B"), (3L, "c")).toDF("id", "tag"), Seq("id"))
    TableLayout.deleteManifested(spark, table, col("id") === 1L)
    val leftovers = Option(new java.io.File(table).listFiles())
      .getOrElse(Array.empty).map(_.getName).filter(_.endsWith(".crc"))
    assert(leftovers.isEmpty,
      s"orphaned checksum sidecars after 3 commits: ${leftovers.mkString(",")}")
  }

  test("engine time travel resolves negative versions to concrete view names") {
    import spark.implicits._
    val e = new GraftEngine(spark)
    val path = freshTable()
    e.createManifestTable("tt_neg", path, Seq((1L, 1.0)).toDF("id", "v"))
    e.upsertManifestTable("tt_neg", Seq((1L, 2.0)).toDF("id", "v"), Seq("id"))
    // -1 = current (2 snapshots → index 1); the registered name carries
    // the CONCRETE index, since `tt_neg_v-1` is not a valid identifier
    e.registerManifestVersion("tt_neg", -1)
    assert(e.sql("SELECT v FROM tt_neg_v1").head().getDouble(0) == 2.0)
    e.registerManifestVersion("tt_neg", -2)
    assert(e.sql("SELECT v FROM tt_neg_v0").head().getDouble(0) == 1.0)
  }

  test("refcounted vacuum never deletes a dir a retained snapshot still references") {
    import spark.implicits._
    val table = freshTable()
    TableLayout.writeManifestedBucketed(
      (0L until 1000L).map(i => (i, 1.0)).toDF("id", "v"), table, "id", 100L)
    TableLayout.upsertManifestedBucketed(spark, table,
      (250L until 300L).map(i => (i, 9.0)).toDF("id", "v"))
    val dir0 = TableLayout.snapshots(spark, table).head // simple: the initial dir line is parts too
    // drop snapshot 0; its dir is still the home of buckets 0,1,3..9
    assert(TableLayout.vacuumManifested(spark, table, keep = 1) == 1)
    val got = TableLayout.readManifested(spark, table)
      .as[(Long, Double)].collect().toMap
    assert(got.size == 1000 && got(250L) == 9.0 && got(0L) == 1.0)
    assert(dir0 != null)
  }

  test("compacting a partition-scoped table consolidates to one dir, preserves buckets and values") {
    import spark.implicits._
    val table = freshTable()
    TableLayout.writeManifestedBucketed(
      (0L until 1000L).map(i => (i, 1.0)).toDF("id", "v"), table, "id", 100L)
    TableLayout.upsertManifestedBucketed(spark, table,
      (250L until 300L).map(i => (i, 9.0)).toDF("id", "v"))
    TableLayout.upsertManifestedBucketed(spark, table,
      (700L until 720L).map(i => (i, 7.0)).toDF("id", "v"))
    val before = TableLayout.readManifested(spark, table)
      .as[(Long, Double)].collect().toMap

    val files = TableLayout.compactManifested(spark, table, targetBytes = 1L << 30)
    assert(files > 0)
    val lastLine = TableLayout.snapshots(spark, table).last
    val dirs = lastLine.split('\t').last.split(',')
      .map(_.split('=')(1)).toSet
    assert(dirs.size == 1, s"compaction must consolidate to one dir: $dirs")
    val after = TableLayout.readManifested(spark, table)
      .as[(Long, Double)].collect().toMap
    assert(after == before)
    // the consolidated table still takes partition-scoped merges
    TableLayout.upsertManifestedBucketed(spark, table,
      Seq((0L, 42.0)).toDF("id", "v"))
    assert(TableLayout.readManifested(spark, table)
      .filter(col("id") === 0L).as[(Long, Double)].head()._2 == 42.0)
  }

  test("changesBetween classifies inserts/updates/deletes; NULL-valued updates don't resurrect old values") {
    import spark.implicits._
    val table = freshTable()
    val base = Seq((1L, Some(10.0)), (2L, Some(20.0)), (3L, Some(30.0)), (4L, None))
      .toDF("id", "v")
    TableLayout.writeManifested(base, table)
    // update 2 (to NULL!), delete 3, insert 5, leave 1 and 4 untouched
    TableLayout.upsertManifested(spark, table,
      Seq((2L, None), (5L, Some(50.0)), (4L, None)).toDF("id", "v"), Seq("id"))
    TableLayout.deleteManifested(spark, table, col("id") === 3L)

    val ch = TableLayout.changesBetween(spark, table, 0, -1, Seq("id"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getString(2))).toSet
    assert(ch == Set(
      (2L, None, "updated"),        // 20.0 -> NULL: must surface NULL, not 20.0
      (3L, Some(30.0), "deleted"),  // deletes carry the old values
      (5L, Some(50.0), "inserted")))
    // untouched rows (1, and 4 re-upserted with an identical NULL) absent
    assert(!ch.exists(c => c._1 == 1L || c._1 == 4L))
  }

  test("partition-scoped read prunes replaced buckets at planning time") {
    import spark.implicits._
    val table = freshTable()
    TableLayout.writeManifestedBucketed(
      (0L until 1000L).map(i => (i, 1.0)).toDF("id", "v"), table, "id", 100L)
    TableLayout.upsertManifestedBucketed(spark, table,
      (250L until 300L).map(i => (i, 9.0)).toDF("id", "v"))
    // DataFrame.inputFiles reports the UNPRUNED FileIndex, so probe the
    // executed plan: FileSourceScanExec.selectedPartitions is the file
    // set AFTER planning-time partition pruning (the __bucket isin
    // filter on the parquet partition column)
    val df = TableLayout.readManifested(spark, table)
    val files = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.flatMap(_.selectedPartitions.toPartitionArray.map(_.filePath.toString))
    assert(files.nonEmpty, "expected FileSourceScanExec nodes in the plan")
    val snaps = TableLayout.snapshots(spark, table)
    def dirOf(line: String, bucket: Long): String =
      line.split('\t').last.split(',').map(_.split('='))
        .collectFirst { case Array(b, d) if b.toLong == bucket => d }.get
    val oldDir = dirOf(snaps.head, 2L)
    val newDir = dirOf(snaps.last, 2L)
    // the old dir's bucket-2 files are EXCLUDED from the scan's file
    // set (planning-time partition pruning through the isin filter);
    // the merge dir's bucket-2 files are in
    assert(!files.exists(f => f.contains(oldDir) && f.contains("__bucket=2/")),
      "replaced bucket must be pruned from the old dir's scan")
    assert(files.exists(f => f.contains(newDir) && f.contains("__bucket=2/")))
    assert(files.exists(f => f.contains(oldDir) && f.contains("__bucket=0/")),
      "untouched buckets still read from the original dir")
  }

  test("concurrent reader during a stream of upserts always sees a complete committed snapshot") {
    import spark.implicits._
    val table = freshTable()
    // every committed snapshot satisfies the invariant sum(v) == 100 * count
    val base = (1L to 50L).map(i => (i, 100.0)).toDF("id", "v")
    TableLayout.writeManifested(base.repartition(8), table)

    val stop = new AtomicBoolean(false)
    val bad = new AtomicReference[String](null)
    val reader = new Thread(() => {
      while (!stop.get() && bad.get() == null) {
        try {
          val r = TableLayout.readManifested(spark, table)
            .agg(sum("v").as("s"), count(lit(1)).as("n")).head()
          if (r.getDouble(0) != 100.0 * r.getLong(1))
            bad.set(s"inconsistent snapshot: sum=${r.getDouble(0)} n=${r.getLong(1)}")
        } catch {
          case e: Exception => bad.set(s"reader failed: ${e.getMessage}")
        }
      }
    })
    reader.start()
    try {
      (1 to 3).foreach { round =>
        val updates = (1L to 60L).map(i => (i, 100.0)).toDF("id", "v")
        TableLayout.upsertManifested(spark, table, updates.repartition(4), Seq("id"))
      }
    } finally {
      stop.set(true)
      reader.join(30000)
    }
    assert(bad.get() == null, String.valueOf(bad.get()))
    assert(TableLayout.readManifested(spark, table).count() == 60)
  }
}
