package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** User-facing analytics engine: the Spark-native counterpart of the
  * reference's `OlapEngine` (/root/reference/gpu-olap-core/src/lib.rs).
  *
  * The reference pipeline (sqlparser → LogicalPlan → optimizer →
  * PhysicalPlan → CUDA kernels) is replaced wholesale by Catalyst +
  * Tungsten: `sql()` hands the query to Spark's parser/optimizer, and
  * whole-stage codegen plays the role of the reference's JIT kernel
  * compiler (/root/reference/gpu-kernel-compiler/src/codegen.rs).
  * We only add the catalog + library surface on top.
  */
final class GraftEngine(val spark: SparkSession) {
  private val registered = mutable.LinkedHashMap[String, String]()

  /** Register a parquet file/directory as a queryable table
    * (reference: catalog.rs `load_table`). */
  def loadTable(name: String, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    df.createOrReplaceTempView(name)
    registered(name) = path
    df
  }

  /** reference: catalog.rs `list_tables`. */
  def listTables: Seq[String] = registered.keys.toSeq

  def table(name: String): DataFrame = spark.table(name)

  /** SQL entry point (reference: lib.rs `execute_query`). Catalyst
    * performs predicate/projection pushdown, filter merging, constant
    * folding and join planning (reference: optimizer.rs) natively. */
  def sql(query: String): DataFrame = spark.sql(query)
}

object GraftEngine {
  /** Session tuned for the local[32] test harness but with settings that
    * transfer to a real cluster: AQE on (runtime coalesce + skew-join
    * handling), modest shuffle parallelism, UTC semantics. */
  def session(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Load every table of a test-data scale-factor directory. */
  def forDir(spark: SparkSession, dir: String): GraftEngine = {
    val e = new GraftEngine(spark)
    Tables.all.foreach(t => e.loadTable(t, s"$dir/$t.parquet"))
    e
  }
}

/** Canonical table set of the test corpus (TPC-H-ish + pipeline tables). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
