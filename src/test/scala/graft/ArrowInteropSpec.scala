package graft

import java.nio.file.Files
import graft.sources.ArrowInterop
import org.apache.spark.sql.functions._

class ArrowInteropSpec extends SparkSpec {

  private def orders = spark.read.parquet(s"$sfDir/orders.parquet")
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")

  test("arrow IPC round-trip preserves every row and value") {
    val dir = Files.createTempDirectory("arrow_rt").toString
    ArrowInterop.writeIpc(orders, dir)
    val back = ArrowInterop.readIpc(spark, dir)
    assert(back.schema.fieldNames.toSeq == orders.schema.fieldNames.toSeq)
    assert(back.count() == orders.count())
    // full-value equality both directions
    assert(back.exceptAll(orders).count() == 0)
    assert(orders.exceptAll(back).count() == 0)
  }

  test("writeIpc is distributed: one stream file per partition") {
    val dir = Files.createTempDirectory("arrow_parts").toString
    val df = orders.repartition(4)
    ArrowInterop.writeIpc(df, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".arrow"))
    assert(files.length == 4)
    assert(files.forall(_.length() > 0))
  }

  test("re-writing a directory with fewer partitions leaves no stale parts") {
    val dir = Files.createTempDirectory("arrow_rw").toString
    ArrowInterop.writeIpc(orders.repartition(4), dir)
    ArrowInterop.writeIpc(orders.limit(50).repartition(2), dir)
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".arrow"))
    assert(parts.length == 2, s"stale parts survived: ${parts.map(_.getName).toSeq}")
    assert(ArrowInterop.readIpc(spark, dir).count() == 50)
  }

  test("collectIpcBytes produces a parseable IPC stream (to_pandas analogue)") {
    val bytes = ArrowInterop.collectIpcBytes(orders.limit(100))
    assert(bytes.length > 0)
    val allocator = new org.apache.arrow.memory.RootAllocator()
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(bytes), allocator)
    var rows = 0L
    try {
      while (reader.loadNextBatch()) rows += reader.getVectorSchemaRoot.getRowCount
    } finally { reader.close(); allocator.close() }
    assert(rows == 100)
  }

  test("binary and null-bearing columns survive the round-trip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("arrow_bin").toString
    val df = Seq(
      (1L, Some("abc"), Array[Byte](1, 2, 3), true),
      (2L, None, Array[Byte](), false)).toDF("id", "s", "b", "flag")
    ArrowInterop.writeIpc(df, dir)
    val back = ArrowInterop.readIpc(spark, dir).orderBy("id").collect()
    assert(back(0).getAs[Array[Byte]]("b").toSeq == Seq[Byte](1, 2, 3))
    assert(back(1).isNullAt(1))
    assert(back(1).getAs[Boolean]("flag") == false)
  }

  test("unsupported column types fail fast with a named column") {
    import spark.implicits._
    val df = Seq((1L, Map("a" -> 1))).toDF("id", "m")
    val e = intercept[Exception] {
      ArrowInterop.writeIpc(df, Files.createTempDirectory("arrow_bad").toString)
    }
    assert(e.getMessage.contains("m"))
  }

  test("embeddings table (array<float>) round-trips through IPC") {
    val dir = Files.createTempDirectory("arrow_emb").toString
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    ArrowInterop.writeIpc(emb, dir)
    val back = ArrowInterop.readIpc(spark, dir)
    assert(back.schema == emb.schema,
      s"schema drifted: ${back.schema} vs ${emb.schema}")
    assert(back.count() == emb.count())
    assert(back.exceptAll(emb).count() == 0)
    assert(emb.exceptAll(back).count() == 0)
  }

  test("array<string>, array<double>, empty and null arrays survive the round-trip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("arrow_arr").toString
    val df = Seq(
      (1L, Seq("a", "bc", "def"), Seq(1.5, -2.25)),
      (2L, Seq.empty[String], Seq.empty[Double]),
      (3L, null, null))
      .toDF("id", "toks", "vec")
    ArrowInterop.writeIpc(df, dir)
    val back = ArrowInterop.readIpc(spark, dir).orderBy("id").collect()
    assert(back(0).getSeq[String](1) == Seq("a", "bc", "def"))
    assert(back(0).getSeq[Double](2) == Seq(1.5, -2.25))
    assert(back(1).getSeq[String](1).isEmpty && back(1).getSeq[Double](2).isEmpty)
    assert(back(2).isNullAt(1) && back(2).isNullAt(2))
  }

  test("pyarrow reads a Spark-written list stream byte-identically (cross-impl check)") {
    val dir = Files.createTempDirectory("arrow_py").toString
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50)
    ArrowInterop.writeIpc(emb.coalesce(1), dir)
    val py =
      """import sys, glob, pyarrow as pa, pyarrow.ipc as ipc
        |t = pa.Table.from_batches([b for f in sorted(glob.glob(sys.argv[1]+'/*.arrow'))
        |    for b in ipc.open_stream(f)])
        |vals = t.to_pydict()
        |s = sum(x for v in vals[t.column_names[1]] if v is not None for x in v)
        |print(f"{t.num_rows} {s:.4f}")""".stripMargin
    val proc = new ProcessBuilder("python3", "-c", py, dir).redirectErrorStream(true).start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream).mkString.trim
    if (proc.waitFor() != 0)
      cancel(s"python3/pyarrow unavailable in this environment: $out")
    val Array(nRows, pySum) = out.split(" ")
    assert(nRows.toLong == 50)
    val sparkSum = emb.select(explode(col(emb.columns(1))).as("x"))
      .agg(sum(col("x").cast("double"))).head().getDouble(0)
    assert(math.abs(pySum.toDouble - sparkSum) < 1e-2,
      s"pyarrow sum $pySum vs spark $sparkSum")
  }
}
