package graft

import graft.operators.Scd
import org.apache.spark.sql.functions._

/** q52 SCD Type-2 dimension build. */
class ScdSpec extends SparkSpec {

  import spark.implicits._

  private def log(rows: Seq[(Long, String, Int, Long)]) =
    rows.toDF("k", "a", "day", "tie")
      .select(col("k"), col("a"),
        to_timestamp(date_add(lit("2024-01-01").cast("date"), col("day"))).as("d"),
        col("tie"))

  test("scd2 collapses runs, re-opens versions, and leaves the current open") {
    // k=1: O,O,F,O — runs collapse to O(v1), F(v2), O(v3): a value
    // REAPPEARING after a change opens a new version, never extends
    // the old one. k=2: a single observation is version 1, still open.
    val df = log(Seq(
      (1L, "O", 0, 1L), (1L, "O", 1, 2L), (1L, "F", 2, 3L), (1L, "O", 3, 4L),
      (2L, "P", 0, 5L)))
    val out = Scd.scd2(df, col("k"), col("a"), col("d"), col("tie"))
      .orderBy("key", "version").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3), r.getString(4)))
    assert(out.toSeq == Seq(
      (1L, 1, "O", "2024-01-01", "2024-01-03"),
      (1L, 2, "F", "2024-01-03", "2024-01-04"),
      (1L, 3, "O", "2024-01-04", null),
      (2L, 1, "P", "2024-01-01", null)))
  }

  test("scd2 breaks same-instant ties by the tie column") {
    // two observations at the same timestamp: the tie column orders
    // them, so the run structure is deterministic (F first, then O)
    val df = log(Seq((1L, "F", 0, 1L), (1L, "O", 0, 2L)))
    val out = Scd.scd2(df, col("k"), col("a"), col("d"), col("tie"))
      .orderBy("version").collect().map(r => (r.getInt(1), r.getString(2)))
    assert(out.toSeq == Seq((1, "F"), (2, "O")))
  }

  test("q52 plans ONE corpus exchange: both windows share the key and ordering") {
    val plan = queries.ExtQueries.defs("q52_scd2")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"))
  }
}
