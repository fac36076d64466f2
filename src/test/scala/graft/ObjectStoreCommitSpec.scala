package graft

import graft.sources.TableLayout
import graft.testfs.ObjStoreHooks
import org.apache.hadoop.fs.{CreateFlag, FileContext, Options, Path => HPath}
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.{CountDownLatch, TimeUnit}

/** Round-8 verdict item 8: the object-store commit story, proven
  * against a FileSystem shim whose rename is observably non-atomic
  * (graft.testfs — the `objstore:` scheme).
  *
  * Test 1 pins the FAILURE MODE the atomic-rename protocol would have
  * on such a store: rename-with-OVERWRITE exposes a window with NO
  * manifest. Tests 2-4 prove the shipped mitigation: on non-
  * atomic-rename schemes, manifest tables commit through immutable
  * create-exclusive log versions (the conditional-PUT recipe), so a
  * racing reader always resolves a complete committed snapshot and
  * racing committers retry instead of losing updates.
  */
class ObjectStoreCommitSpec extends AnyFunSuite with SparkSpec
    with BeforeAndAfterEach {

  private lazy val conf = {
    val c = spark.sparkContext.hadoopConfiguration
    c.set("fs.objstore.impl", "graft.testfs.NonAtomicLocalFileSystem")
    c.set("fs.AbstractFileSystem.objstore.impl", "graft.testfs.NonAtomicRenameFs")
    c
  }

  private def tmpTable(name: String): String = {
    conf // force registration
    "objstore://" + java.nio.file.Files
      .createTempDirectory(s"graft_objstore_$name").toString + "/tbl"
  }

  override def afterEach(): Unit = {
    ObjStoreHooks.onRename = (_, _) => ()
    super.afterEach()
  }

  test("rename-with-OVERWRITE on the shim exposes a no-manifest window") {
    val table = tmpTable("race")
    val fc = FileContext.getFileContext(new java.net.URI(table), conf)
    val mf = new HPath(table, "manifest")
    def put(p: HPath, s: String): Unit = {
      val out = fc.create(p,
        java.util.EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
        Options.CreateOpts.createParent())
      try out.write(s.getBytes("UTF-8")) finally out.close()
    }
    put(mf, "v1")
    val tmp = new HPath(table, ".manifest.tmp1")
    put(tmp, "v1\nv2")
    @volatile var sawGap = false
    ObjStoreHooks.onRename = (_, dst) =>
      if (dst.getName == "manifest") sawGap = !fc.util.exists(mf)
    fc.rename(tmp, mf, Options.Rename.OVERWRITE)
    assert(sawGap,
      "expected the manifest to be ABSENT inside the shim's rename window " +
        "— the exact gap a racing reader on an object store can observe")
  }

  test("manifest tables on an objstore scheme commit via immutable log versions") {
    import spark.implicits._
    val table = tmpTable("log")
    TableLayout.writeManifested(Seq((1, "a"), (2, "b")).toDF("k", "v"), table)
    TableLayout.writeManifested(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"), table)
    val fc = FileContext.getFileContext(new java.net.URI(table), conf)
    assert(!fc.util.exists(new HPath(table, "manifest")),
      "objstore scheme must not use the single rewritten manifest file")
    assert(fc.util.exists(new HPath(table, ".manifest-log")))
    assert(TableLayout.snapshots(spark, table).size == 2)
    assert(TableLayout.readManifested(spark, table).count() == 3)
    // time travel still works across log-committed snapshots
    assert(TableLayout.readManifestedAt(spark, table, 0).count() == 2)
  }

  test("a reader racing a stream of log commits never observes a gap") {
    import spark.implicits._
    val table = tmpTable("reader")
    TableLayout.writeManifested(Seq((0, "x")).toDF("k", "v"), table)
    @volatile var stop = false
    @volatile var failure: Option[Throwable] = None
    @volatile var reads = 0
    val reader = new Thread(() => {
      while (!stop && failure.isEmpty) {
        try {
          val n = TableLayout.readManifested(spark, table).count()
          assert(n >= 1)
          reads += 1
        } catch { case t: Throwable => failure = Some(t) }
      }
    })
    reader.start()
    (1 to 5).foreach { i =>
      TableLayout.writeManifested(
        (0 to i).map(j => (j, "x")).toDF("k", "v"), table)
    }
    stop = true
    reader.join(30000)
    assert(failure.isEmpty,
      s"racing reader failed after $reads reads: ${failure.map(_.getMessage)}")
    assert(reads > 0, "reader never completed a read — race not exercised")
    assert(TableLayout.snapshots(spark, table).size == 6)
  }

  test("racing committers all land via the create-exclusive retry loop") {
    import spark.implicits._
    val table = tmpTable("cas")
    TableLayout.writeManifested(Seq((0, "x")).toDF("k", "v"), table)
    // Rendezvoused committers with overlapping read-modify-write
    // windows, several rounds: every loser of the create-exclusive
    // must retry and land — never silently lose. The version a commit
    // attempts is anchored to the SAME listing its content was read
    // from (TableLayout.logReadForCommit); deriving them from two
    // reads once lost a commit under load (read stale content, list
    // AFTER the rival's create, land on a fresh number) — this test
    // with 3 committers × 3 rounds is the regression net for that.
    val rounds = 3
    val writers = 3
    for (r <- 0 until rounds) {
      val gate = new CountDownLatch(writers)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val ts = (1 to writers).map { i =>
        new Thread(() => {
          try {
            val df = Seq((i, s"writer$r-$i")).toDF("k", "v")
            gate.countDown()
            gate.await(10, TimeUnit.SECONDS)
            TableLayout.writeManifested(df, table)
          } catch { case t: Throwable => errs.add(t) }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join(60000))
      assert(errs.isEmpty, s"committer failed in round $r: ${errs.peek()}")
    }
    val hist = TableLayout.snapshots(spark, table)
    assert(hist.size == 1 + rounds * writers,
      s"a racing commit was lost: history=$hist")
    assert(hist.toSet.size == hist.size)
  }

  test("vacuum prunes superseded log versions with the history") {
    import spark.implicits._
    val table = tmpTable("vacuum")
    (0 to 3).foreach(i =>
      TableLayout.writeManifested(Seq((i, "x")).toDF("k", "v"), table))
    assert(TableLayout.vacuumManifested(spark, table, keep = 1) == 3)
    assert(TableLayout.snapshots(spark, table) ==
      Seq(TableLayout.snapshots(spark, table).last))
    val fc = FileContext.getFileContext(new java.net.URI(table), conf)
    val it = fc.listStatus(new HPath(table, ".manifest-log"))
    var n = 0
    while (it.hasNext) { it.next(); n += 1 }
    assert(n == 1, s"superseded log versions survived vacuum ($n left)")
    assert(TableLayout.readManifested(spark, table).count() == 1)
  }

  test("artifact store commits by create-exclusive pointer on the object-store scheme") {
    implicit val s = spark
    val root = tmpTable("artifact")
    val src = spark.read.parquet(s"$sfDir/embeddings.parquet")
    @volatile var renamedPointer = false
    ObjStoreHooks.onRename = (_, dst) =>
      if (dst.getName.startsWith("ptr_")) renamedPointer = true
    val served = graft.sources.ArtifactStore.getOrBuild(src, root, "t") {
      src.select("vec_id").limit(5)
    }
    assert(served.count() == 5)
    assert(!renamedPointer,
      "the artifact commit must be a create-exclusive pointer, never a rename")
    val p = new HPath(root)
    val fs = p.getFileSystem(conf)
    def state = fs.listStatus(p).map(st =>
      (st.getPath.getName, st.getLen, st.getModificationTime)).toSeq.sortBy(_._1)
    val committed = state
    assert(committed.exists(_._1.startsWith("ptr_")), "pointer missing")
    // a second resolution serves the committed version UNTOUCHED and
    // never evaluates the build thunk
    val again = graft.sources.ArtifactStore.getOrBuild(src, root, "t")(
      fail("second resolution must not rebuild"))
    assert(again.count() == 5)
    assert(state == committed, "reuse modified the committed artifact")
    // a parameter change commits a NEW immutable version alongside
    val v2 = graft.sources.ArtifactStore.getOrBuild(src, root, "t2")(
      src.select("vec_id").limit(3))
    assert(v2.count() == 3)
    assert(fs.listStatus(p).count(_.getPath.getName.startsWith("ptr_")) == 2,
      "the old fingerprint's commit must remain immutable")
  }
}
