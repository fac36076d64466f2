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
    val df = Seq((1L, Seq(1.0))).toDF("id", "vec")
    val e = intercept[Exception] {
      ArrowInterop.writeIpc(df, Files.createTempDirectory("arrow_bad").toString)
    }
    assert(e.getMessage.contains("vec"))
  }
}
