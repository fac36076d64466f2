package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.EventAnalytics
import Ops._

/** Event-sequence analytics over the `events` stream table: ordered
  * conversion funnels, cohort retention, and path transitions — the
  * product-analytics queries (Amplitude/Mixpanel-style) an OLAP engine
  * over an event log is asked for daily. Reference evidence: the
  * reference's events examples stop at per-type aggregation
  * (examples/python_usage.py windowed counts); sequence analytics is
  * part of the deferred "future work" surface we include, like windows
  * and subqueries.
  *
  * The reusable column-parametric operators live in
  * [[graft.operators.EventAnalytics]]; this file wires them to the
  * fixture tables and carries the DuckDB value oracles. Scale-shape
  * documentation sits on the operator methods.
  */
object EventQueries {

  /** Funnel step types, in order (shared with the streaming twin). */
  val FunnelSteps: Seq[String] = EventAnalytics.FunnelSteps

  val defs: Map[String, Q] = Map(
    // q47 ordered funnel: greedy earliest-match fold ≡ the oracle's
    // min-timestamp CTE chain (strict > between stages, both engines).
    "q47_funnel" -> ((s, dir) =>
      EventAnalytics.funnel(events(s, dir), FunnelSteps,
        col("user_id"), col("ts"), col("event_type"))
        .orderSmall("stage")),

    // q48 weekly cohort retention. Weeks are date_trunc Mondays in both
    // engines, so the day difference is exactly divisible by 7 and the
    // offset division is exact (no rounding-mode divergence); the
    // cohort week is emitted as an ISO string because the physical DATE
    // type round-trips differently through the two engines' result
    // paths.
    "q48_retention" -> ((s, dir) =>
      EventAnalytics.retention(events(s, dir), col("user_id"), col("ts"))
        .orderSmall("cohort_week", "week_offset")),

    // q49 event-path transitions: the first-order Markov matrix (the
    // Sankey/path-analysis query); event_id breaks same-instant ties
    // identically in both engines.
    "q49_transitions" -> ((s, dir) =>
      EventAnalytics.transitions(events(s, dir),
        col("user_id"), col("ts"), col("event_type"), col("event_id"))
        .orderSmall("src", "dst")),

    // q50 A/B experiment readout: md5-hash arm split, conversion =
    // (>= AbConvThreshold purchases), pooled two-proportion z-test.
    // The synthetic log gives every user some purchases, so a count
    // threshold near the per-user median is what makes conversion a
    // non-degenerate ~50% outcome. Every z input is an exact integer
    // count through one fixed parenthesization, so the statistic is
    // bit-identical in both engines.
    "q50_ab_test" -> ((s, dir) =>
      EventAnalytics.abTest(events(s, dir),
        col("user_id"), col("event_type"),
        convertType = "purchase", minCount = AbConvThreshold)),

    // q51 last-touch attribution: each purchase credits the nearest
    // preceding non-purchase event of the same user (ties broken by
    // event_id in both engines); orphan purchases credit 'direct'.
    "q51_attribution" -> ((s, dir) =>
      EventAnalytics.attribution(events(s, dir), col("user_id"), col("ts"),
        col("event_type"), col("event_id"), col("value"),
        convertType = "purchase")
        .orderSmall("channel")),

    // q53 trailing z-score anomaly detection on daily event volumes
    // (7 observed days' lookback, |z| > 3 flags).
    "q53_anomaly" -> ((s, dir) =>
      EventAnalytics.anomalies(events(s, dir), col("event_type"), col("ts"))
        .orderSmall("event_type", "day")),

    // q55 time-series resampling: densify the per-type daily series
    // onto the full calendar, LOCF + linear interpolation in the gaps.
    // The fixture log is dense by construction, so ~25% of cells are
    // deterministically dropped first (md5 prefix c-f — the t18
    // harness discipline) to give the fill real gaps to close.
    "q55_gapfill" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(col("event_type").as("key"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val kept = daily.filter(!substring(
        md5(concat(col("key"), lit("|"), col("day").cast("string"))), 1, 1)
        .isin("c", "d", "e", "f"))
      EventAnalytics.fillDaily(kept).orderBy("key", "day")
    }),

    // q58 heartbeat-gap detection: spans where a type's stream went
    // quiet >= 60 min (the data-freshness alarm).
    "q58_silences" -> ((s, dir) =>
      EventAnalytics.silences(events(s, dir), col("event_type"), col("ts"),
        col("event_id"), minGapUs = SilenceGapUs)
        .orderBy("key", "start_us")),

    // q59 cohort LTV: cumulative purchase revenue per cohort user by
    // week offset (q48's cohorts + dsum-exact running revenue).
    "q59_cohort_ltv" -> ((s, dir) =>
      EventAnalytics.cohortLtv(events(s, dir), col("user_id"), col("ts"),
        col("event_type"), col("value"), revenueType = "purchase")
        .orderSmall("cohort_week", "week_offset")),

    // q60 daily percentile bands: rank-selected exact p50/p95 of the
    // event value per (type, day) — the latency-dashboard readout.
    "q60_percentile_bands" -> ((s, dir) =>
      EventAnalytics.percentileBands(events(s, dir), col("event_type"),
        col("ts"), col("value"), col("event_id"))
        .orderBy("key", "day"))
  )

  /** q58 silence threshold: 60 minutes in epoch micros. */
  val SilenceGapUs: Long = 60L * 60 * 1000000

  /** q50 conversion bar: users with at least this many purchases
    * convert (the fixture's per-user purchase count is ~Binomial(67,
    * 0.2) ≈ 13, so 14 splits the population near the median). */
  val AbConvThreshold = 14

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
        |FROM c ORDER BY src, dst""".stripMargin,

    // q50: identical hash split, identical conversion threshold, one
    // identically-parenthesized z expression over exact integer counts
    // (NULLIF on the denominator mirrors the Spark-side degenerate
    // guard)
    "q50_ab_test" ->
      s"""WITH pu AS (SELECT user_id,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      >= $AbConvThreshold AS INT) AS converted,
         |    ('0x' || substr(md5('ab|' || CAST(user_id AS VARCHAR)), 1, 2))::BIGINT % 2 AS arm
         |  FROM events GROUP BY user_id),
         |arms AS (SELECT arm, COUNT(*) AS n, SUM(converted) AS c FROM pu GROUP BY arm),
         |one AS (SELECT
         |    CAST(SUM(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n0,
         |    CAST(SUM(CASE WHEN arm = 0 THEN c END) AS BIGINT) AS c0,
         |    CAST(SUM(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n1,
         |    CAST(SUM(CASE WHEN arm = 1 THEN c END) AS BIGINT) AS c1
         |  FROM arms),
         |d AS (SELECT n0, c0, n1, c1,
         |    CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
         |    CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
         |    (CAST(c0 AS DOUBLE) + CAST(c1 AS DOUBLE))
         |      / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)) AS pp
         |  FROM one)
         |SELECT n0, c0, n1, c1,
         |  round(p0, 6) AS rate0, round(p1, 6) AS rate1,
         |  round((p1 - p0) / NULLIF(sqrt(pp * (1.0 - pp)
         |    * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))), 0), 6) AS z,
         |  (abs((p1 - p0) / NULLIF(sqrt(pp * (1.0 - pp)
         |    * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))), 0)) > 1.96) AS significant
         |FROM d""".stripMargin,

    // q51: identical window (same partition/order/frame, IGNORE NULLS
    // last_value), identical dsum discipline on the attributed value
    "q51_attribution" ->
      """WITH a AS (SELECT event_type, value,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |               IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM events)
        |SELECT coalesce(touch, 'direct') AS channel,
        |  COUNT(*) AS conversions,
        |  CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS attributed_value
        |FROM a WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY channel""".stripMargin,

    // q53: identical trailing frame, identical integer-sum-derived
    // mean/variance parenthesization, identical thin-history and
    // zero-variance NULL semantics
    "q53_anomaly" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    COUNT(*) AS cnt FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, day, cnt,
        |    COUNT(cnt) OVER win AS n7,
        |    CAST(SUM(cnt) OVER win AS DOUBLE) AS s,
        |    CAST(SUM(cnt * cnt) OVER win AS DOUBLE) AS s2
        |  FROM daily
        |  WINDOW win AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |c AS (SELECT event_type, day, cnt, n7,
        |    (CAST(cnt AS DOUBLE) - s / 7.0) /
        |      (CASE WHEN s2 / 7.0 - (s / 7.0) * (s / 7.0) > 0.0
        |            THEN sqrt(s2 / 7.0 - (s / 7.0) * (s / 7.0)) END) AS z
        |  FROM w)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, cnt,
        |  CASE WHEN n7 = 7 THEN round(z, 6) END AS z,
        |  CASE WHEN n7 = 7 THEN CAST(abs(z) > 3.0 AS INT) END AS is_anomaly
        |FROM c ORDER BY event_type, day""".stripMargin,

    // q55: identical planted sparsity, calendar generation, IGNORE
    // NULLS anchor windows, and one-parenthesization interpolation
    // (Spark datediff(a,b) = a-b = DuckDB date_diff('day', b, a))
    "q55_gapfill" ->
      """WITH daily AS (SELECT event_type AS key, CAST(ts AS DATE) AS day,
        |    COUNT(*) AS cnt FROM events GROUP BY 1, 2),
        |kept AS (SELECT * FROM daily
        |  WHERE substr(md5(key || '|' || CAST(day AS VARCHAR)), 1, 1)
        |        NOT IN ('c', 'd', 'e', 'f')),
        |env AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM kept),
        |keys AS (SELECT DISTINCT key FROM kept),
        |cal AS (SELECT key, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM keys CROSS JOIN env),
        |j AS (SELECT c.key, c.day, k.cnt FROM cal c
        |  LEFT JOIN kept k ON c.key = k.key AND c.day = k.day),
        |f AS (SELECT key, day, cnt,
        |    last_value(cnt IGNORE NULLS) OVER wb AS locf,
        |    first_value(cnt IGNORE NULLS) OVER wf AS nocb,
        |    last_value(CASE WHEN cnt IS NOT NULL THEN day END IGNORE NULLS) OVER wb AS pd,
        |    first_value(CASE WHEN cnt IS NOT NULL THEN day END IGNORE NULLS) OVER wf AS nd
        |  FROM j
        |  WINDOW wb AS (PARTITION BY key ORDER BY day
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wf AS (PARTITION BY key ORDER BY day
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT key, strftime(day, '%Y-%m-%d') AS day,
        |  CAST(cnt IS NOT NULL AS INT) AS observed, cnt,
        |  coalesce(locf, nocb) AS locf,
        |  CASE WHEN cnt IS NOT NULL THEN CAST(cnt AS DOUBLE)
        |       WHEN pd IS NOT NULL AND nd IS NOT NULL THEN
        |         round(CAST(locf AS DOUBLE) +
        |           (CAST(nocb AS DOUBLE) - CAST(locf AS DOUBLE)) *
        |           CAST(date_diff('day', pd, day) AS DOUBLE) /
        |           CAST(date_diff('day', pd, nd) AS DOUBLE), 6)
        |       ELSE CAST(coalesce(locf, nocb) AS DOUBLE) END AS filled
        |FROM f ORDER BY key, day""".stripMargin,

    // q58: identical window, identical epoch-micros span arithmetic
    "q58_silences" ->
      s"""WITH g AS (SELECT event_type AS key, epoch_us(ts) AS us,
         |    lead(epoch_us(ts)) OVER
         |      (PARTITION BY event_type ORDER BY epoch_us(ts), event_id) AS nxt
         |  FROM events)
         |SELECT key, us AS start_us, nxt AS end_us, nxt - us AS gap_us
         |FROM g WHERE nxt IS NOT NULL AND nxt - us >= $SilenceGapUs
         |ORDER BY key, start_us""".stripMargin,

    // q59: q48's cohort arithmetic + dsum-exact revenue, cumulative in
    // DECIMAL until the output cast
    "q59_cohort_ltv" ->
      """WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cw
        |           FROM events GROUP BY user_id),
        |sizes AS (SELECT cw, COUNT(*) AS cohort_users FROM f GROUP BY cw),
        |rev AS (SELECT f.cw,
        |    CAST(date_diff('day', CAST(f.cw AS DATE),
        |                   CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS INT)
        |      AS week_offset,
        |    SUM(CAST(e.value AS DECIMAL(28,4))) AS rev_d
        |  FROM events e JOIN f USING (user_id)
        |  WHERE e.event_type = 'purchase'
        |  GROUP BY 1, 2),
        |c AS (SELECT cw, week_offset, rev_d,
        |    SUM(rev_d) OVER (PARTITION BY cw ORDER BY week_offset
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_d
        |  FROM rev)
        |SELECT strftime(CAST(c.cw AS DATE), '%Y-%m-%d') AS cohort_week,
        |  week_offset, cohort_users,
        |  CAST(rev_d AS DOUBLE) AS revenue,
        |  CAST(cum_d AS DOUBLE) AS cum_revenue,
        |  round(CAST(cum_d AS DOUBLE) / CAST(cohort_users AS DOUBLE), 6) AS ltv_per_user
        |FROM c JOIN sizes USING (cw)
        |ORDER BY cohort_week, week_offset""".stripMargin,

    // q60: identical rank window (ties by event_id) and integer-exact
    // ceil-rank selection — no quantile-interpolation ambiguity
    "q60_percentile_bands" ->
      """WITH r AS (SELECT event_type AS key, CAST(ts AS DATE) AS day, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |                       ORDER BY value, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type, CAST(ts AS DATE)) AS n
        |  FROM events)
        |SELECT key, strftime(day, '%Y-%m-%d') AS day,
        |  CAST(MAX(n) AS BIGINT) AS n,
        |  MAX(CASE WHEN rn = (50 * n + 99) // 100 THEN value END) AS p50,
        |  MAX(CASE WHEN rn = (95 * n + 99) // 100 THEN value END) AS p95
        |FROM r GROUP BY 1, 2 ORDER BY key, day""".stripMargin
  )
}
