package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over an event log: ordered funnels, cohort
  * retention, and path transitions — the reusable, column-parametric
  * forms behind q47/q48/q49 (see
  * [[graft.queries.EventQueries]] for the fixture wiring and the
  * DuckDB-oracle shape of each; `EventStreams.funnelProgress` is the
  * funnel's incremental streaming twin).
  */
object EventAnalytics {

  /** Ordered conversion funnel: for each user the highest step of
    * `steps` reached by a strictly-time-increasing subsequence, rolled
    * up to per-stage user counts (every stage reported, unreached = 0).
    *
    * ONE corpus shuffle (the user grouping); the fold is linear per
    * user and greedy earliest-match — provably equal to the
    * min-timestamp CTE chain (strict `>` between stages). A log with
    * pathological single-user fan-in would switch to k sequential
    * conditional aggregates — same semantics, O(1) state per user.
    */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: Column, tsCol: Column, typeCol: Column): DataFrame = {
    require(steps.nonEmpty)
    val spark = events.sparkSession
    val e = events
      .filter(typeCol.isin(steps: _*))
      .select(userCol.as("__u"), unix_micros(tsCol).as("t"), typeCol.as("event_type"))
    val perUser = e.groupBy("__u")
      .agg(sort_array(collect_list(struct(col("t"), col("event_type")))).as("seq"))
    val cases = steps.zipWithIndex.map { case (step, i) =>
      s"""WHEN acc.stage = $i AND x.event_type = '$step' AND x.t > acc.at
         |  THEN struct(CAST(${i + 1} AS INT) AS stage, x.t AS at)""".stripMargin
    }.mkString("\n")
    // -1 sentinel: below any post-epoch timestamp
    val stage = expr(
      s"""aggregate(
         |  seq,
         |  struct(CAST(0 AS INT) AS stage, CAST(-1 AS BIGINT) AS at),
         |  (acc, x) -> CASE
         |    $cases
         |    ELSE acc END,
         |  acc -> acc.stage)""".stripMargin)
    val counts = perUser.select(stage.as("user_stage"))
      .filter(col("user_stage") >= 1)
      .select(explode(sequence(lit(1), col("user_stage"))).as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("users"))
    spark.range(1, steps.size + 1)
      .select(col("id").cast("int").as("stage"))
      .join(counts, Seq("stage"), "left")
      .na.fill(0L, Seq("users"))
  }

  /** Weekly cohort retention: users bucketed by the Monday-truncated
    * week of their first event; per (cohort week, whole-week offset)
    * the distinct active users. Both shuffles key on the user column;
    * the final count-distinct is partial-aggregated. */
  def retention(events: DataFrame, userCol: Column, tsCol: Column): DataFrame = {
    val e = events.select(userCol.as("__u"), tsCol.as("__ts"))
    val first = e.groupBy("__u").agg(date_trunc("week", min(col("__ts"))).as("cw"))
    e.join(first, "__u")
      .select(
        col("__u"),
        date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
        (datediff(date_trunc("week", col("__ts")).cast("date"), col("cw").cast("date")) / 7)
          .cast("int").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("__u")).as("active_users"))
  }

  /** First-order Markov transitions: per-user consecutive event pairs
    * (ordered by time, then `tieCol` for determinism), counted and
    * normalized to conditional probabilities per source type. The
    * lead() window partitions by user — never globally; normalization
    * runs on the type-vocabulary rollup. */
  def transitions(events: DataFrame, userCol: Column, tsCol: Column,
                  typeCol: Column, tieCol: Column): DataFrame = {
    val perUser = Window.partitionBy("__u").orderBy(col("__ts"), col("__tie"))
    val steps = events
      .select(userCol.as("__u"), tsCol.as("__ts"), tieCol.as("__tie"),
        typeCol.as("__type"))
      .withColumn("nxt", lead(col("__type"), 1).over(perUser))
      .filter(col("nxt").isNotNull)
    val counts = steps
      .groupBy(col("__type").as("src"), col("nxt").as("dst"))
      .agg(count(lit(1)).as("cnt"))
    val perSrc = Window.partitionBy("src")
    counts.withColumn("p",
      round(col("cnt").cast("double") / sum(col("cnt")).over(perSrc).cast("double"), 6))
  }
}
