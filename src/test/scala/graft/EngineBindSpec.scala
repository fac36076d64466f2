package graft

import java.nio.file.Files
import graft.sources.ArrowInterop
import org.apache.spark.sql.functions._

/** The reference's `query_pandas` shape (examples/python_usage.py:300-318):
  * bind an in-process frame, query it by name against the parquet
  * catalog, get the result back out — in-JVM and through the Arrow IPC
  * bridge a real pandas client would use.
  */
class EngineBindSpec extends SparkSpec {

  test("registerDataFrame joins an in-process frame against parquet tables via sql") {
    import spark.implicits._
    val e = GraftEngine.cachedForDir(spark, sfDir)
    val seg = Seq(("BUILDING", 1.5), ("MACHINERY", 2.0), ("AUTOMOBILE", 3.0))
      .toDF("segment", "weight")
    e.registerDataFrame("segment_weights", seg)
    assert(e.listTables.contains("segment_weights"))
    val out = e.sql(
      """SELECT w.segment, COUNT(*) AS n_cust,
        |  SUM(w.weight) AS total_weight
        |FROM customer c JOIN segment_weights w ON c.c_mktsegment = w.segment
        |GROUP BY w.segment ORDER BY w.segment""".stripMargin).collect()
    assert(out.length == 3)
    // weight sums must be n_cust * weight exactly (weights join 1:n)
    val weights = Map("AUTOMOBILE" -> 3.0, "BUILDING" -> 1.5, "MACHINERY" -> 2.0)
    out.foreach { r =>
      assert(r.getDouble(2) == r.getLong(1) * weights(r.getString(0)))
    }
  }

  test("registered frame stays lazy and composes with pushdown") {
    import spark.implicits._
    val e = GraftEngine.cachedForDir(spark, sfDir)
    val big = spark.range(1000000).select(col("id"),
      (col("id") % 7).as("bucket"))
    e.registerDataFrame("gen_buckets", big)
    val q = e.sql("SELECT COUNT(*) AS n FROM gen_buckets WHERE bucket = 3")
    // the filter must sit below the aggregate inside the bound plan,
    // not on top of a materialized table
    assert(q.queryExecution.optimizedPlan.toString().contains("Filter"))
    assert(q.head().getLong(0) == (0L until 1000000L).count(_ % 7 == 3))
  }

  test("pandas-shaped round trip: pyarrow writes IPC, graft queries it, pyarrow reads the answer") {
    val inDir = Files.createTempDirectory("bind_in").toString
    val py =
      s"""import pyarrow as pa, pyarrow.ipc as ipc
         |t = pa.table({'nation_key': pa.array([0,1,2], pa.int64()),
         |              'boost': pa.array([10.0, 20.0, 30.0], pa.float64())})
         |with ipc.new_stream('$inDir/part-00000.arrow', t.schema) as w:
         |    w.write_table(t)""".stripMargin
    val p1 = new ProcessBuilder("python3", "-c", py).redirectErrorStream(true).start()
    val o1 = scala.io.Source.fromInputStream(p1.getInputStream).mkString
    if (p1.waitFor() != 0) cancel(s"python3/pyarrow unavailable: $o1")

    val e = GraftEngine.cachedForDir(spark, sfDir)
    e.registerDataFrame("nation_boost",
      ArrowInterop.readIpc(spark, inDir, requireSuccessMarker = false))
    val res = e.sql(
      """SELECT n.n_name, b.boost
        |FROM nation n JOIN nation_boost b ON n.n_nationkey = b.nation_key
        |ORDER BY n.n_nationkey""".stripMargin)
    val bytes = ArrowInterop.collectIpcBytes(res)
    val outFile = Files.createTempFile("bind_out", ".arrow")
    Files.write(outFile, bytes)
    val py2 =
      s"""import pyarrow.ipc as ipc
         |t = ipc.open_stream('$outFile').read_all()
         |print(t.num_rows, sum(t.column('boost').to_pylist()))""".stripMargin
    val p2 = new ProcessBuilder("python3", "-c", py2).redirectErrorStream(true).start()
    val o2 = scala.io.Source.fromInputStream(p2.getInputStream).mkString.trim
    assert(p2.waitFor() == 0, s"pyarrow read failed: $o2")
    assert(o2 == "3 60.0", s"unexpected python-side answer: $o2")
  }

  test("index views repoint at the committed artifacts after a build — same name, same rows") {
    val e = GraftEngine.forDir(spark, sfDir)
    e.registerPipelineViews()
    // before the build: lazy views plan straight over the corpus files
    val lazyBand = spark.table("graft_minhash_pairs")
    val lazySpan = spark.table("graft_substring_pairs")
    assert(lazyBand.inputFiles.forall(_.contains("documents.parquet")))
    assert(lazySpan.inputFiles.forall(_.contains("documents.parquet")))
    val bandRows = lazyBand.orderBy("doc_a", "doc_b").collect().toSeq
    val spanRows = lazySpan.orderBy("doc_a", "doc_b").collect().toSeq
    val root = Files.createTempDirectory("graft_view_repoint").toString
    e.registerBandIndexView(Some(s"$root/band"))
    e.registerSpanIndexView(Some(s"$root/span"))
    // after: the SAME view names resolve plans over the committed
    // artifact files (build-don't-declare split — SURVEY §3/README),
    // and the SQL surface answers identically
    val band = spark.table("graft_minhash_pairs")
    val span = spark.table("graft_substring_pairs")
    assert(new java.io.File(s"$root/band/_SUCCESS").exists())
    assert(new java.io.File(s"$root/span/_SUCCESS").exists())
    assert(band.inputFiles.nonEmpty && band.inputFiles.forall(_.contains(s"$root/band")),
      s"band view must read the committed index, got ${band.inputFiles.take(3).mkString(",")}")
    assert(span.inputFiles.nonEmpty && span.inputFiles.forall(_.contains(s"$root/span")),
      s"span view must read the committed index, got ${span.inputFiles.take(3).mkString(",")}")
    assert(band.orderBy("doc_a", "doc_b").collect().toSeq == bandRows)
    assert(span.orderBy("doc_a", "doc_b").collect().toSeq == spanRows)
    // idempotent per engine: a second call neither rebuilds nor rebinds
    def mtimes = new java.io.File(s"$root/band").listFiles()
      .map(f => f.getName -> f.lastModified).toMap
    val before = mtimes
    e.registerBandIndexView(Some(s"$root/band"))
    assert(mtimes == before)
    // restore the lazy views for any later spec sharing the session
    e.registerPipelineViews()
  }

  test("simhash index view: pairs repoint at the committed signatures, sigs view registered") {
    val e = GraftEngine.forDir(spark, sfDir)
    e.registerPipelineViews()
    val lazyPairs = spark.table("graft_simhash_pairs")
    assert(lazyPairs.inputFiles.forall(_.contains("documents.parquet")))
    val pairRows = lazyPairs.orderBy("doc_a", "doc_b").collect().toSeq
    val root = Files.createTempDirectory("graft_simhash_repoint").toString
    e.registerSimhashIndexView(Some(s"$root/sim"))
    // the SAME pair view now plans over the committed signature index,
    // answering identically; the raw signatures gained a SQL surface
    val pairs = spark.table("graft_simhash_pairs")
    val sigs = spark.table("graft_simhash_sigs")
    assert(new java.io.File(s"$root/sim/_SUCCESS").exists())
    assert(pairs.inputFiles.nonEmpty && pairs.inputFiles.forall(_.contains(s"$root/sim")),
      s"pair view must read the committed index, got ${pairs.inputFiles.take(3).mkString(",")}")
    assert(sigs.inputFiles.nonEmpty && sigs.inputFiles.forall(_.contains(s"$root/sim")))
    assert(pairs.orderBy("doc_a", "doc_b").collect().toSeq == pairRows)
    // the sigs view IS the index: one 64-bit signature per document
    import org.apache.spark.sql.functions.{col, length}
    assert(sigs.count() == spark.read.parquet(s"$sfDir/documents.parquet").count())
    assert(sigs.filter(length(col("simhash")) =!= 64).count() == 0)
    // idempotent per engine: a second call neither rebuilds nor rebinds
    def mtimes = new java.io.File(s"$root/sim").listFiles()
      .map(f => f.getName -> f.lastModified).toMap
    val before = mtimes
    e.registerSimhashIndexView(Some(s"$root/sim"))
    assert(mtimes == before)
    e.registerPipelineViews()
  }
}
