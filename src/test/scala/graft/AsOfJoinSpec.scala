package graft

import java.sql.Timestamp
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of picks the most recent prior-or-equal right row per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // after r@09 → 9.0
      (2L, 10L, ts("2024-01-01 12:00:00")), // equal to r@12 → inclusive, 12.0
      (3L, 10L, ts("2024-01-01 08:00:00")), // before any right → null
      (4L, 20L, ts("2024-01-01 10:00:00"))  // other key, no right rows → null
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 09:00:00"), 9.0),
      (10L, ts("2024-01-01 12:00:00"), 12.0)
    ).toDF("k", "t", "v")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"))
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out(0).getDouble(3) == 9.0)
    assert(out(1).getDouble(3) == 12.0)
    assert(out(2).isNullAt(3) && out(3).isNullAt(3))
  }

  test("a right row with a NULL payload field still shadows older right rows") {
    import spark.implicits._
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 08:00:00"), Some(8.0)),
      (1L, ts("2024-01-01 09:00:00"), None: Option[Double])
    ).toDF("k", "t", "v")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("t", "v"))
      .collect().head
    // carried row is the 09:00 one (null v), not the older 08:00
    assert(out.getAs[Timestamp]("asof_t") == ts("2024-01-01 09:00:00"))
    assert(out.isNullAt(out.fieldIndex("asof_v")))
  }

  test("tolerance masks a nearest-prior match outside the lookback — no fallback") {
    import spark.implicits._
    val left = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")), // nearest right 09:45, within 30m
      (2L, 1L, ts("2024-01-01 11:00:00"))  // nearest right 09:45, 75m → masked
    ).toDF("id", "k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 9.0), // older than 09:45 — never a fallback
      (1L, ts("2024-01-01 09:45:00"), 9.75)
    ).toDF("k", "t", "v")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"),
      toleranceMs = Some(30 * 60 * 1000L)).orderBy("id").collect()
    assert(out(0).getDouble(3) == 9.75)
    assert(out(1).isNullAt(3), "match outside tolerance must be NULL, not the older row")
  }

  test("plan is a single window over one shuffle — no join operator") {
    import spark.implicits._
    val left = (1 to 100).map(i => (i.toLong, (i % 5).toLong, ts(f"2024-01-01 ${i % 24}%02d:00:00")))
      .toDF("id", "k", "t")
    val right = (1 to 50).map(i => ((i % 5).toLong, ts(f"2024-01-01 ${i % 24}%02d:00:00"), i.toDouble))
      .toDF("k", "t", "v")
    val plan = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"))
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), "expected a Window operator")
    // exactly one exchange: the partitionBy(k) shuffle
    assert("Exchange".r.findAllIn(plan).length == 1, s"expected one shuffle:\n$plan")
  }

  test("q26 oracle shape holds on real events: every attributed click has purch_ts <= click ts") {
    val e = graft.queries.Ops.events(spark, sfDir)
    val clicks = e.filter(col("event_type") === "click").select("event_id", "user_id", "ts")
    val purchases = e.filter(col("event_type") === "purchase").select("user_id", "ts", "value")
    val out = AsOfJoin.backward(clicks, purchases, Seq("user_id"), "ts", "ts", Seq("ts", "value"))
    assert(out.count() == clicks.count(), "as-of must preserve left cardinality")
    assert(out.filter(col("asof_ts") > col("ts")).count() == 0, "attributed purchase after click")
  }
}
