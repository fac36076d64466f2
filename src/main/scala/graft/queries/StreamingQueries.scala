package graft.queries

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import Ops._

/** Batch-equivalent entries for the streaming operators q30/q31
  * (SURVEY.md §2 #30–#31). The SAME transform code runs on readStream
  * sources (see graft.streaming + StreamingSpec); these run it on the
  * batch `events` table so the driver's DuckDB oracle can check the
  * values — batch result ≡ streaming result once all windows close.
  */
object StreamingQueries {

  val defs: Map[String, Q] = Map(
    // #30 watermark + event-time windowed aggregation (batch equivalent)
    "q30_stream_batch" -> ((s, dir) =>
      EventStreams.windowedCounts(events(s, dir))
        .orderSmall("w_start", "event_type")),

    // q45 windowed top-k "trending" (batch form; the stream applies the
    // same ranking in foreachBatch over closed windows — StreamingSpec)
    "q45_trending" -> ((s, dir) =>
      EventStreams.trending(events(s, dir))
        .orderSmall("w_start", "rank")),

    // #31 gap-based sessionization (batch-equivalent window/lag form)
    "q31_session_batch" -> ((s, dir) =>
      EventStreams.sessionizeBatch(events(s, dir))
        .orderBy("user_id", "session_seq")),

    // q32 streaming dedup (batch-equivalent first-event-per-key form;
    // the streaming twin is dropDuplicatesWithinWatermark — see
    // EventStreams.dedupKeyed + StreamingSpec)
    "q32_stream_dedup" -> ((s, dir) =>
      EventStreams.firstEventPerKey(events(s, dir))
        .orderBy("user_id", "event_type")),

    // q38 stream-stream interval join (batch-equivalent entry; the
    // streaming twin watermarks both sides and the bounded interval
    // predicate is what caps the join state — see
    // EventStreams.clickPurchaseJoin + StreamingSpec)
    "q38_stream_join" -> ((s, dir) => {
      val e = events(s, dir)
      EventStreams.clickPurchaseJoin(
        e.filter(col("event_type") === "click"),
        e.filter(col("event_type") === "purchase"))
        .orderBy("click_id", "purchase_ts")
    }),

    // q44 capped attribution join — the hot-key defense for q38's
    // interval join (WindowGroupLimit bounds output to k rows/click;
    // see SCALE.md round 4 for the measured 583x amplification it caps)
    "q44_join_capped" -> ((s, dir) => {
      val e = events(s, dir)
      EventStreams.clickPurchaseJoinCapped(
        e.filter(col("event_type") === "click"),
        e.filter(col("event_type") === "purchase"))
        .orderBy("click_id", "attr_rank")
    }),

    // q36 stream-static enrichment join (batch-equivalent entry; the
    // streaming twin joins each micro-batch against the broadcast
    // dimension — see EventStreams.enrichedCounts + StreamingSpec)
    "q36_stream_enrich" -> ((s, dir) =>
      EventStreams.enrichedCounts(events(s, dir), t(s, dir, "customer"))
        .orderSmall("c_mktsegment", "event_type")))

  val oracles: Map[String, String] = Map(
    "q30_stream_batch" ->
      s"""SELECT date_trunc('hour', ts) AS w_start,
         |  date_trunc('hour', ts) + INTERVAL 1 HOUR AS w_end,
         |  event_type, COUNT(*) AS cnt, ${sqlDsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2, 3 ORDER BY w_start, event_type""".stripMargin,

    "q45_trending" ->
      s"""WITH counts AS (
         |  SELECT date_trunc('hour', ts) AS w_start,
         |    date_trunc('hour', ts) + INTERVAL 1 HOUR AS w_end,
         |    event_type, COUNT(*) AS cnt
         |  FROM events GROUP BY 1, 2, 3)
         |SELECT w_start, w_end, event_type, cnt, rank FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER
         |    (PARTITION BY w_start ORDER BY cnt DESC, event_type ASC) AS INTEGER) AS rank
         |  FROM counts)
         |WHERE rank <= ${EventStreams.TrendingK}
         |ORDER BY w_start, rank""".stripMargin,

    "q31_session_batch" ->
      s"""WITH flagged AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
         |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > ${EventStreams.SessionGapMs * 1000L}
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         |indexed AS (
         |  SELECT *, CAST(SUM(new_sess) OVER
         |    (PARTITION BY user_id ORDER BY ts
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
         |  FROM flagged)
         |SELECT user_id, session_seq, MIN(ts) AS session_start,
         |  MAX(ts) AS session_end, COUNT(*) AS n_events,
         |  ${sqlDsum("value")} AS total_value
         |FROM indexed GROUP BY user_id, session_seq
         |ORDER BY user_id, session_seq""".stripMargin,

    "q32_stream_dedup" ->
      """SELECT user_id, event_type, event_id AS first_event_id,
        |  ts AS first_ts, value AS first_value
        |FROM (SELECT *, ROW_NUMBER() OVER
        |    (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "q38_stream_join" ->
      s"""WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
         |  FROM events WHERE event_type = 'click'),
         |p AS (SELECT user_id AS p_user, ts AS purchase_ts,
         |    value AS purchase_value
         |  FROM events WHERE event_type = 'purchase')
         |SELECT click_id, user_id, click_ts, purchase_ts, purchase_value
         |FROM c JOIN p ON user_id = p_user
         |  AND purchase_ts >= click_ts
         |  AND purchase_ts <= click_ts + INTERVAL ${EventStreams.JoinWindowMs / 1000} SECOND
         |ORDER BY click_id, purchase_ts""".stripMargin,

    "q44_join_capped" ->
      s"""WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
         |  FROM events WHERE event_type = 'click'),
         |p AS (SELECT user_id AS p_user, event_id AS purchase_id,
         |    ts AS purchase_ts, value AS purchase_value
         |  FROM events WHERE event_type = 'purchase'),
         |ranked AS (
         |  SELECT click_id, user_id, click_ts, purchase_id, purchase_ts,
         |    purchase_value,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY click_id
         |      ORDER BY purchase_ts, purchase_id) AS INTEGER) AS attr_rank
         |  FROM c JOIN p ON user_id = p_user
         |    AND purchase_ts >= click_ts
         |    AND purchase_ts <= click_ts + INTERVAL ${EventStreams.JoinWindowMs / 1000} SECOND)
         |SELECT * FROM ranked WHERE attr_rank <= ${EventStreams.AttributionCap}
         |ORDER BY click_id, attr_rank""".stripMargin,

    "q36_stream_enrich" ->
      s"""SELECT c_mktsegment, event_type, COUNT(*) AS cnt,
         |  ${sqlDsum("value")} AS sum_value
         |FROM events JOIN customer ON user_id = c_custkey
         |GROUP BY c_mktsegment, event_type
         |ORDER BY c_mktsegment, event_type""".stripMargin)
}
