package graft

/** External-client entry point for the Arrow IPC interop path
  * (reference: examples/python_usage.py:74-205 `query_pandas` /
  * `query_polars`): a host process (pandas/polars/R/anything that
  * writes Arrow IPC stream files) hands the engine one or more frames
  * as `.arrow` directories, a SQL string over them, and an output
  * directory; the engine binds each frame into the session catalog,
  * runs the query, and writes the result back as Arrow IPC for the
  * host to read — `scripts/python_usage.py` drives the full round
  * trip.
  *
  * Usage: `runMain graft.ArrowQuery <outDir> <sql> <name=ipcDir> ...`
  *
  * The registered frames are LAZY ([[GraftEngine.registerDataFrame]]):
  * Catalyst optimizes across the bind boundary, so a filter in `sql`
  * pushes into the IPC scan's plan like any view. Parquet tables can
  * be mixed in by passing `name=/path/to/table.parquet` with
  * `.parquet` suffix.
  */
object ArrowQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ArrowQuery <outDir> <sql> <name=ipcDirOrParquet> [...]")
    val outDir = args(0)
    val sql = args(1)
    val spark = GraftEngine.session(GraftConfig(
      master = "local[8]", appName = "graft-arrow-query", shufflePartitions = 8))
    val engine = new GraftEngine(spark)
    args.drop(2).foreach { bind =>
      val Array(name, dir) = bind.split("=", 2)
      if (dir.endsWith(".parquet")) engine.loadTable(name, dir)
      else engine.registerDataFrame(name,
        sources.ArrowInterop.readIpc(spark, dir, requireSuccessMarker = false))
    }
    sources.ArrowInterop.writeIpc(engine.sql(sql), outDir)
    println(s"""{"arrow_query":"ok","out":"$outDir"}""")
    spark.stop()
  }
}
