package graft

import graft.queries.Ops
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canary for silent test-fixture regeneration.
  *
  * Round 6 lost 15 driver queries because events.parquet changed its
  * physical `ts` type (TIMESTAMP(NANOS) → plain micros) between rounds
  * and the loader assumed one vintage. This spec (a) pins the expected
  * logical schema of every fixture table so the NEXT drift fails one
  * named test with a readable message instead of 15 queries, and
  * (b) proves the loader adapts to all three `ts` vintages it claims
  * to handle, using synthetic fixtures.
  */
class FixtureDriftSpec extends SparkSpec {

  private val expectedColumns = Map(
    "region"     -> Set("r_regionkey", "r_name"),
    "nation"     -> Set("n_nationkey", "n_name", "n_regionkey"),
    "customer"   -> Set("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier"   -> Set("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part"       -> Set("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders"     -> Set("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                        "o_orderdate", "o_orderpriority"),
    "lineitem"   -> Set("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
                        "l_linestatus", "l_shipdate"),
    "events"     -> Set("event_id", "user_id", "event_type", "ts", "value", "props"),
    "documents"  -> Set("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Set("vec_id", "embedding", "label"))

  test("fixture tables carry the expected columns (drift canary)") {
    expectedColumns.foreach { case (name, cols) =>
      val actual = Ops.t(spark, sfDir, name).columns.toSet
      val missing = cols -- actual
      assert(missing.isEmpty,
        s"FIXTURE DRIFT: $sfDir/$name.parquet lost columns $missing " +
          s"(has ${actual.toSeq.sorted.mkString(", ")})")
    }
  }

  test("events.ts physical type is a vintage the loader handles") {
    val dt = Ops.t(spark, sfDir, "events").schema("ts").dataType
    assert(Set[DataType](LongType, TimestampNTZType, TimestampType).contains(dt),
      s"FIXTURE DRIFT: events.ts read as $dt — extend Ops.normalizeEventTs " +
        "for this vintage before anything else; 15 queries depend on it")
    // whatever the vintage, the normalized loader must yield TimestampType
    assert(Ops.events(spark, sfDir).schema("ts").dataType == TimestampType)
  }

  test("normalizeEventTs adapts to all three ts vintages, same instants") {
    val tmp = new java.io.File("target/tmp/fixture-drift").getAbsolutePath
    // one known instant: 2024-03-01T12:34:56.789Z
    val micros = 1709296496789000L

    // vintage 1: legacy nanos-as-long (what nanosAsLong=true yields)
    val nanosDf = spark.range(1).select(
      lit(1L).as("event_id"), lit(7L).as("user_id"), lit("click").as("event_type"),
      lit(micros * 1000L).as("ts"))
    nanosDf.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val fromNanos = Ops.events(spark, tmp).select(col("ts").cast("long")).head().getLong(0)

    // vintage 2: plain micros (TIMESTAMP_NTZ on read)
    val ntzDf = spark.range(1).select(
      lit(1L).as("event_id"), lit(7L).as("user_id"), lit("click").as("event_type"),
      timestamp_micros(lit(micros)).cast(TimestampNTZType).as("ts"))
    ntzDf.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val fromNtz = Ops.events(spark, tmp).select(col("ts").cast("long")).head().getLong(0)

    // vintage 3: session-TZ timestamp already
    val tzDf = spark.range(1).select(
      lit(1L).as("event_id"), lit(7L).as("user_id"), lit("click").as("event_type"),
      timestamp_micros(lit(micros)).as("ts"))
    tzDf.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val fromTz = Ops.events(spark, tmp).select(col("ts").cast("long")).head().getLong(0)

    assert(fromNanos == micros / 1000000L, "nanos-as-long vintage mis-rebuilt")
    assert(fromNtz == micros / 1000000L, "micros/NTZ vintage mis-normalized")
    assert(fromTz == micros / 1000000L, "timestamp vintage changed by pass-through")
  }

  test("normalized temporal values land in a sane epoch range (unit-drift canary)") {
    // a schema-level check cannot catch UNIT drift: if a future fixture
    // stored epoch-seconds in a long ts column, the nanos rebuild would
    // read as ~1970 while every query still "works". Pin the decade.
    val evYears = Ops.events(spark, sfDir)
      .agg(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi")).head()
    assert(evYears.getInt(0) >= 2015 && evYears.getInt(1) <= 2035,
      s"FIXTURE DRIFT: events.ts normalizes to years ${evYears.getInt(0)}–" +
        s"${evYears.getInt(1)} — check the physical unit of the ts column")
    val shipYears = Ops.t(spark, sfDir, "lineitem")
      .agg(min(year(col("l_shipdate"))).as("lo"), max(year(col("l_shipdate"))).as("hi")).head()
    assert(shipYears.getInt(0) >= 1990 && shipYears.getInt(1) <= 2005,
      s"FIXTURE DRIFT: l_shipdate spans ${shipYears.getInt(0)}–" +
        s"${shipYears.getInt(1)} — outside the TPC-H date range the " +
        "h-suite's literal predicates assume")
  }

  test("catalog SQL surface sees the normalized events ts (engine view)") {
    val e = GraftEngine.forDir(spark, sfDir)
    val viaSql = e.sql("SELECT ts FROM events").schema("ts").dataType
    assert(viaSql == TimestampType,
      s"engine.sql sees raw events.ts ($viaSql) — loadTable normalization lost")
    // and the values agree with the programmatic loader on a checksum
    val sqlSum = e.sql("SELECT CAST(SUM(CAST(ts AS LONG)) AS LONG) AS s FROM events")
      .head().getLong(0)
    val opsSum = Ops.events(spark, sfDir)
      .agg(sum(col("ts").cast("long")).cast("long").as("s")).head().getLong(0)
    assert(sqlSum == opsSum, "SQL-surface events.ts disagrees with Ops.events")
  }
}
