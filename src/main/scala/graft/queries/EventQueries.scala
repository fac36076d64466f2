package graft.queries

import org.apache.spark.sql.functions._
import Ops._

/** Event-sequence analytics over the `events` stream table: ordered
  * conversion funnels and cohort retention — the product-analytics
  * queries (Amplitude/Mixpanel-style) an OLAP engine over an event log
  * is asked for daily. Reference evidence: the reference's events
  * examples stop at per-type aggregation (examples/python_usage.py
  * windowed counts); sequence analytics is part of the deferred "future
  * work" surface we include, like windows and subqueries.
  *
  * Both queries have full DuckDB value oracles.
  */
object EventQueries {

  /** Funnel step types, in order. */
  val FunnelSteps: Seq[String] = Seq("view", "click", "purchase")

  val defs: Map[String, Q] = Map(
    // q47 ordered funnel: how many users have a view, then a click
    // strictly after it, then a purchase strictly after that. The
    // greedy earliest-match fold is optimal for subsequence matching,
    // so it computes exactly the min-timestamp CTE chain the oracle
    // runs (stage k's timestamp is the earliest qualifying event after
    // stage k-1's).
    //
    // Scale shape: ONE shuffle — events project to (user_id, t, type),
    // group by user, and the whole funnel evaluates map-side per user
    // as sort_array + a linear aggregate() fold over that user's
    // events (per-user event counts are bounded in any real log; no
    // window over the global stream, no per-stage self-join — the
    // 3-join CTE form the oracle uses would be 3 corpus shuffles).
    // The stage→count rollup then aggregates 1 row per user.
    // Robustness: the isin() filter prunes to funnel-step types before
    // the collect, so per-user state is funnel events only; a log with
    // pathological single-user fan-in (bot traffic, 10^7+ rows/user)
    // would switch to the k-sequential-conditional-aggregate shape the
    // oracle runs — same semantics, k co-partitioned shuffles instead
    // of one, O(1) state per user.
    "q47_funnel" -> ((s, dir) => {
      val e = events(s, dir)
        .filter(col("event_type").isin(FunnelSteps: _*))
        .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_type"))
      val perUser = e.groupBy("user_id")
        .agg(sort_array(collect_list(struct(col("t"), col("event_type")))).as("seq"))
      // Fold state: (stage reached so far, timestamp it was reached at).
      // Advance on the first event of the next step type strictly after
      // the current stage's timestamp. The initial -1 sentinel is below
      // any post-epoch timestamp (events fixtures are 2024 micros).
      val stage = expr(
        s"""aggregate(
           |  seq,
           |  struct(CAST(0 AS INT) AS stage, CAST(-1 AS BIGINT) AS at),
           |  (acc, x) -> CASE
           |    WHEN acc.stage = 0 AND x.event_type = '${FunnelSteps(0)}' AND x.t > acc.at
           |      THEN struct(CAST(1 AS INT) AS stage, x.t AS at)
           |    WHEN acc.stage = 1 AND x.event_type = '${FunnelSteps(1)}' AND x.t > acc.at
           |      THEN struct(CAST(2 AS INT) AS stage, x.t AS at)
           |    WHEN acc.stage = 2 AND x.event_type = '${FunnelSteps(2)}' AND x.t > acc.at
           |      THEN struct(CAST(3 AS INT) AS stage, x.t AS at)
           |    ELSE acc END,
           |  acc -> acc.stage)""".stripMargin)
      val counts = perUser.select(stage.as("user_stage"))
        .filter(col("user_stage") >= 1)
        .select(explode(sequence(lit(1), col("user_stage"))).as("stage"))
        .groupBy("stage").agg(count(lit(1)).as("users"))
      // A stage nobody reaches must still report 0 (the oracle's UNION
      // form always emits 3 rows).
      s.range(1, FunnelSteps.size + 1)
        .select(col("id").cast("int").as("stage"))
        .join(counts, Seq("stage"), "left")
        .na.fill(0L, Seq("users"))
        .orderBy("stage")
    }),

    // q48 weekly cohort retention: users bucketed by the week of their
    // first event; for each (cohort week, week offset) the count of
    // distinct users active that week. Weeks are date_trunc Mondays in
    // both engines, so the day difference is exactly divisible by 7 and
    // the offset division is exact (no rounding-mode divergence).
    //
    // Scale shape: groupBy(user) for the cohort week and the
    // events-to-cohort join shuffle on the SAME key (user_id), so AQE
    // plans them back-to-back on one co-partitioning; the final
    // count-distinct shuffles only (cohort, offset, user) triples after
    // map-side partial-distinct. No global window anywhere.
    "q48_retention" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("ts"))
      val first = e.groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).as("cw"))
      e.join(first, "user_id")
        .select(
          col("user_id"),
          // ISO string, not DATE: the physical date type round-trips
          // differently through the two engines' result paths.
          date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
          (datediff(date_trunc("week", col("ts")).cast("date"), col("cw").cast("date")) / 7)
            .cast("int").as("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(countDistinct(col("user_id")).as("active_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // q49 event-path transitions: the first-order Markov transition
    // matrix over per-user event sequences — counts and conditional
    // probabilities of src→dst steps (the Sankey/path-analysis query).
    //
    // Scale shape: ONE corpus shuffle — the lead() window partitions by
    // user_id (never a global window), then the transition rollup and
    // its probability normalization run on the event-type×event-type
    // key space (25 rows here; bounded by the type vocabulary, not the
    // corpus).
    "q49_transitions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val perUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val steps = e.withColumn("nxt", lead(col("event_type"), 1).over(perUser))
        .filter(col("nxt").isNotNull)
      val counts = steps
        .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
        .agg(count(lit(1)).as("cnt"))
      val perSrc = Window.partitionBy("src")
      counts
        .withColumn("p",
          round(col("cnt").cast("double") / sum(col("cnt")).over(perSrc).cast("double"), 6))
        .orderBy("src", "dst")
    })
  )

  val oracles: Map[String, String] = Map(
    "q47_funnel" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type FROM events
         |           WHERE event_type IN (${FunnelSteps.map("'" + _ + "'").mkString(", ")})),
         |s1 AS (SELECT user_id, min(t) AS t1 FROM e
         |       WHERE event_type = '${FunnelSteps(0)}' GROUP BY user_id),
         |s2 AS (SELECT e.user_id, min(t) AS t2 FROM e JOIN s1 USING (user_id)
         |       WHERE event_type = '${FunnelSteps(1)}' AND t > t1 GROUP BY e.user_id),
         |s3 AS (SELECT e.user_id, min(t) AS t3 FROM e JOIN s2 USING (user_id)
         |       WHERE event_type = '${FunnelSteps(2)}' AND t > t2 GROUP BY e.user_id)
         |SELECT stage, users FROM (
         |  SELECT 1 AS stage, count(*) AS users FROM s1
         |  UNION ALL SELECT 2, count(*) FROM s2
         |  UNION ALL SELECT 3, count(*) FROM s3)
         |ORDER BY stage""".stripMargin,

    "q48_retention" ->
      """WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cw
        |           FROM events GROUP BY user_id)
        |SELECT strftime(CAST(cw AS DATE), '%Y-%m-%d') AS cohort_week,
        |  CAST(date_diff('day', CAST(cw AS DATE),
        |                 CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS INT)
        |    AS week_offset,
        |  count(DISTINCT e.user_id) AS active_users
        |FROM events e JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q49_transitions" ->
      """WITH s AS (SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |c AS (SELECT event_type AS src, nxt AS dst, COUNT(*) AS cnt
        |  FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2)
        |SELECT src, dst, cnt,
        |  round(CAST(cnt AS DOUBLE) / CAST(SUM(cnt) OVER (PARTITION BY src) AS DOUBLE), 6) AS p
        |FROM c ORDER BY src, dst""".stripMargin
  )
}
