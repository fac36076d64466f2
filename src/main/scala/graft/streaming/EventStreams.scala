package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.queries.Ops.dsum

/** One event of the `events` table (streaming-typed view). */
final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** A closed user session (SURVEY.md §2 #31). */
final case class Session(user_id: Long, session_start: Timestamp,
    session_end: Timestamp, n_events: Long, total_value: Double)

/** Open-session state carried between triggers. */
final case class SessionState(start: Long, end: Long, n: Long, sum: Double)

/** A funnel advance: user reached `stage` (1-based) at `at` (q47's
  * streaming twin). */
final case class FunnelProgress(user_id: Long, stage: Int, at: Timestamp)

/** Per-user funnel state carried between triggers: highest stage
  * reached and the event time it was reached at. */
final case class FunnelState(stage: Int, at: Long)

/** One observed src→dst step in a user's event path (q49's streaming
  * twin emits these as immutable facts). */
final case class Transition(user_id: Long, src: String, dst: String, at: Timestamp)

/** Per-user path state: the last event seen (type + time). */
final case class LastEvent(tpe: String, at: Long)

/** A scored CLOSED day of one event type's volume series (q53's
  * streaming twin emits these as immutable facts; z/is_anomaly are
  * None on thin history or zero variance, like the batch form). */
final case class AnomalyFact(event_type: String, day: String, cnt: Long,
    z: Option[Double], is_anomaly: Option[Int])

/** Per-type volume state: the open day's running count plus the last
  * (up to 7) CLOSED observed-day counts, oldest first. */
final case class VolumeState(openDay: Long, openCnt: Long, ring: Seq[Long])

/** A closed silence span of one key's stream (q58's streaming twin). */
final case class Silence(key: String, start_us: Long, end_us: Long, gap_us: Long)

/** Structured Streaming operators q30/q31 (SURVEY.md §2 #30–#31).
  *
  * [[windowedCounts]] is written against a plain `DataFrame`, so the
  * SAME code runs on a `readStream` source (incremental, stateful) and
  * on the batch `events` table (the driver's oracle-checkable entry).
  * The STATEFUL transforms ([[sessionize]], [[funnelProgress]],
  * [[transitionSteps]]) must NOT be run on a batch frame as their own
  * oracle: batch execution of flatMapGroupsWithState never fires
  * timeouts, so open state (e.g. each user's final session) is
  * silently dropped — their batch-equivalent oracles are the separate
  * window/fold forms ([[sessionizeBatch]], EventAnalytics.funnel/
  * transitions). Stream ≡ batch-oracle equivalence after all
  * watermarks close is asserted by the MemoryStream specs.
  *
  * Scale: windowed aggregation shuffles once on (window, event_type)
  * with partial aggregation per trigger; sessionization shuffles once on
  * user_id and keeps O(1) state per user (a single open session), so
  * state store size is bounded by active users, not event volume.
  */
object EventStreams {

  val SessionGapMs: Long = 30 * 60 * 1000

  /** q30: event-time windowed aggregation. On a stream the watermark
    * bounds state (late events beyond 10 min are dropped and windows
    * older than the watermark are finalized + evicted). On a batch
    * frame `withWatermark` is a no-op and this is a plain grouped agg —
    * same results once every window has closed. */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** q45: windowed top-k ("trending") — the k highest-count event
    * types per time window. The batch form below is the oracle-checked
    * semantics; on a stream, ranking is not appendable directly (a
    * window's ranks are only final when the watermark closes it), so
    * the streaming twin applies [[trendingOf]] inside `foreachBatch`
    * over the closed-window aggregate — the standard post-aggregation
    * pattern (StreamingSpec pins stream ≡ batch). Scale shape: counts
    * are the q30 partial-aggregated shuffle; the rank window partitions
    * per time window (cardinality = event types, bounded), planned as
    * WindowGroupLimit. */
  def trending(events: DataFrame, k: Int = TrendingK,
      watermark: String = "10 minutes", windowLen: String = "1 hour"): DataFrame =
    trendingOf(windowedCounts(events, watermark, windowLen), k)

  /** The ranking stage alone — applied to q30-shaped closed windows
    * (batch below, or a foreachBatch micro-batch on the stream). */
  def trendingOf(counts: DataFrame, k: Int = TrendingK): DataFrame = {
    val w = Window.partitionBy("w_start")
      .orderBy(col("cnt").desc, col("event_type").asc)
    counts
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("w_start", "w_end", "event_type", "cnt", "rank")
  }

  val TrendingK = 3

  /** q31: gap-based sessionization via flatMapGroupsWithState — one
    * state entry per user holding only the open session. A session
    * closes two ways: a same-user event beyond the gap (emitted
    * immediately), or the event-time WATERMARK passing the gap boundary
    * (EventTimeTimeout fires, the open session is emitted and its state
    * entry REMOVED). The second path is what bounds the state store to
    * currently-active users — without it, one-and-done users would pin
    * state forever and their last session would never be output.
    * Requires a `withWatermark` upstream (applied here). Events inside
    * one trigger are sorted in memory (bounded by the trigger's
    * per-user batch, not history).
    *
    * Disorder tolerance: late events inside the watermark merge into
    * the open session with both bounds extended (start can move
    * backwards), matching the batch form. The one residual
    * approximation of keeping O(1) state: an event arriving more than
    * the GAP before the open session's start merges rather than opening
    * the separate earlier session batch would produce — exact
    * reordering under arbitrary lateness requires buffering the
    * watermark window per key (O(rate × delay) state), which this
    * operator deliberately trades away. */
  /** Timestamp ↔ epoch-MICROsecond conversions: the session state and
    * gap arithmetic run at µs precision to match [[sessionizeBatch]]
    * (which compares `unix_micros` deltas) and the events table's µs
    * timestamps — ms-truncated arithmetic would merge sessions exactly
    * GAP+sub-ms apart and shift emitted bounds on µs-resolution data. */
  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
  private def toTimestamp(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def sessionize(events: Dataset[Event], watermark: String = "10 minutes")(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    val gapUs = SessionGapMs * 1000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          def close(s: SessionState): Session =
            Session(userId, toTimestamp(s.start), toTimestamp(s.end), s.n, s.sum)
          if (it.isEmpty && state.hasTimedOut) {
            // watermark passed session_end + gap: flush and evict
            val out = state.getOption.map(close).iterator
            state.remove()
            out
          } else {
            val sorted = it.toSeq.sortBy(e => micros(e.ts))
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = micros(e.ts)
              cur match {
                case Some(s) if t - s.end > gapUs =>
                  closed += close(s)
                  cur = Some(SessionState(t, t, 1, e.value))
                case Some(s) =>
                  // a late-but-within-watermark event can precede the
                  // open session's start — extend BOTH bounds so the
                  // emitted session matches the batch/oracle computation
                  cur = Some(SessionState(math.min(s.start, t), math.max(s.end, t),
                    s.n + 1, s.sum + e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close the open session once the watermark is past its
              // gap (timeout timestamps are ms-resolution: round UP so
              // the timeout never fires a hair before the µs boundary)
              state.setTimeoutTimestamp(Math.floorDiv(s.end + gapUs + 999L, 1000L))
            }
            closed.result().iterator
          }
      }
  }

  /** q32: streaming exact dedup — emit only the first event per
    * (user_id, event_type). `dropDuplicatesWithinWatermark` holds a
    * state entry per key only until the watermark passes the first
    * occurrence's event time, so state is bounded by key arrival rate ×
    * watermark horizon, not by stream history — the property that makes
    * streaming dedup viable at firehose rates (plain `dropDuplicates`
    * on a stream accumulates every key forever). Within one horizon the
    * dedup is exact; a re-occurrence after the horizon re-emits, which
    * is the standard trade. Keeps the first ARRIVAL: equal to the batch
    * [[firstEventPerKey]] whenever arrival order is event-time order
    * (asserted by the MemoryStream spec). */
  def dedupKeyed(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** q36: stream-static enrichment — every micro-batch of the event
    * stream joins the static customer dimension and rolls up per
    * (segment, event_type). The static side is BROADCAST: each executor
    * holds the dimension once and the stream is never shuffled for the
    * join (stream-static joins are stateless — no watermark state at
    * all; only the downstream aggregation keeps state). The same call
    * works on a batch frame, which is the oracle-checked q36 entry. */
  def enrichedCounts(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
        broadcast(customers.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))

  /** q38: stream-stream interval join — every click paired with the
    * same user's purchases in the hour after it. Both sides carry
    * watermarks and the join predicate bounds purchase_ts to a window
    * around click_ts, which is what lets Structured Streaming EVICT
    * buffered rows: a click older than watermark−1h can never match a
    * future purchase, so per-side state is (rate × (watermark + join
    * window)), never unbounded. Exactly one shuffle on user_id per
    * side. The same call on batch frames is the oracle-checked q38
    * entry — the streaming run converges to it once watermarks pass. */
  val JoinWindowMs: Long = 60 * 60 * 1000

  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
      watermark: String = "10 minutes",
      windowMs: Long = JoinWindowMs): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    c.join(p,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          // millisecond interval: an integer windowMs/1000 silently
          // truncated sub-second windows (500 ms became 0)
          col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $windowMs MILLISECOND"))
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("purchase_ts"), col("purchase_value"))
  }

  val AttributionCap = 3

  /** q44: the hot-key defense for [[clickPurchaseJoin]], motivated by a
    * measured failure mode (SCALE.md round 4): on the sf1skew corpus —
    * one user owning 20 % of both clicks and purchases — the uncapped
    * interval join's OUTPUT grows quadratically in the hot key's rate
    * (3,710 → 2,161,730 rows, 583×). Attribution semantics rarely need
    * every pair; this variant keeps only the FIRST `k` purchases after
    * each click (rank by (purchase_ts, purchase_id) — the id tiebreak
    * makes the kept set deterministic under ts collisions).
    *
    * Scale shape: `row_number <= k` plans as WindowGroupLimit, so the
    * cap applies in the map task BEFORE the rank exchange — the hot
    * user's quadratic pair fan-out is generated streaming inside the
    * join stage and immediately truncated; the shuffle after it
    * carries at most k rows per click. Output is bounded by
    * k × clicks regardless of key skew. */
  def clickPurchaseJoinCapped(clicks: DataFrame, purchases: DataFrame,
      k: Int = AttributionCap, windowMs: Long = JoinWindowMs): DataFrame = {
    val c = clicks.select(col("event_id").as("click_id"), col("user_id"),
      col("ts").as("click_ts"))
    val p = purchases.select(col("user_id").as("p_user"),
      col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
      col("value").as("purchase_value"))
    val w = Window.partitionBy("click_id")
      .orderBy(col("purchase_ts").asc, col("purchase_id").asc)
    c.join(p,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $windowMs MILLISECOND"))
      .withColumn("attr_rank", row_number().over(w))
      .filter(col("attr_rank") <= k)
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("purchase_id"), col("purchase_ts"), col("purchase_value"),
        col("attr_rank"))
  }

  /** Batch-equivalent first-event-per-key (the oracle-checkable q32
    * shape): rank by (ts, event_id) within the key — the event_id
    * tiebreak makes the kept row deterministic under ts collisions —
    * and keep rank 1. `row_number <= 1` plans as WindowGroupLimit:
    * every map task forwards one candidate per key, so the single
    * shuffle on the key carries O(keys × tasks), not the corpus. */
  def firstEventPerKey(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy(col("ts"), col("event_id"))
    events.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        col("event_id").as("first_event_id"), col("ts").as("first_ts"),
        col("value").as("first_value"))
  }

  /** Batch-equivalent sessionization (the oracle-checkable q31 shape):
    * a gap flag per event (lag window), a running sum of gap flags as
    * the session index, then one grouped aggregation per session.
    * Exactly two shuffles, both on user_id — the 100 TB plan. */
  def sessionizeBatch(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > SessionGapMs * 1000L, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("new_sess")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_seq")
      .agg(
        min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
  }

  /** How long a user may sit idle mid-funnel before their state is
    * evicted (no emission — their last progress row already went out).
    * Bounds the state store at O(users active within the horizon). */
  val FunnelIdleMs: Long = 24L * 3600 * 1000

  /** q47's streaming twin: per-user funnel progress maintained
    * incrementally. State is O(1) per user — (stage, reached-at) — and
    * each advance emits an immutable progress fact, so Append mode is
    * correct. A user who completes the funnel is evicted immediately
    * (no further advance is possible); idle users evict at
    * watermark + [[FunnelIdleMs]].
    *
    * Equivalence contract (same trade as q32/d09): the incremental
    * greedy fold equals the batch q47 fold whenever events arrive in
    * event-time order ACROSS triggers (intra-trigger disorder is
    * sorted out locally); a cross-trigger late event that should have
    * advanced an earlier stage cannot be applied retroactively. The
    * MemoryStream spec pins stream ≡ batch under in-order feeding. */
  def funnelProgress(events: Dataset[Event],
      steps: Seq[String] = graft.operators.EventAnalytics.FunnelSteps,
      watermark: String = "10 minutes")(
      implicit spark: SparkSession): Dataset[FunnelProgress] = {
    import spark.implicits._
    val stepSet = steps.toSet
    events
      .filter(e => stepSet.contains(e.event_type))
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[FunnelState]) =>
          if (it.isEmpty && state.hasTimedOut) {
            state.remove() // idle past the horizon; nothing new to emit
            Iterator.empty
          } else {
            var cur = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
            var lastSeen = Long.MinValue
            val out = Seq.newBuilder[FunnelProgress]
            it.toSeq.sortBy(e => micros(e.ts)).foreach { e =>
              val t = micros(e.ts)
              lastSeen = math.max(lastSeen, t)
              // positional comparison (not a name→index map): a funnel
              // with a REPEATED step name advances through each
              // occurrence in order
              if (cur.stage < steps.size &&
                  e.event_type == steps(cur.stage) && t > cur.at) {
                cur = FunnelState(cur.stage + 1, t)
                out += FunnelProgress(userId, cur.stage, toTimestamp(t))
              }
            }
            if (cur.stage >= steps.size) {
              state.remove() // funnel complete: no further advance possible
            } else if (cur.stage > 0) {
              state.update(cur)
              // idle horizon measured from the user's LATEST activity,
              // not the stage-reached time: a mid-funnel user whose
              // non-advancing events keep arriving can carry the
              // watermark far past cur.at, and setTimeoutTimestamp
              // throws if handed a timestamp the watermark already
              // passed — clamp to watermark+1ms as the last defense
              val base = math.max(cur.at, lastSeen)
              val timeoutMs = Math.floorDiv(base + FunnelIdleMs * 1000L + 999L, 1000L)
              state.setTimeoutTimestamp(
                math.max(timeoutMs, state.getCurrentWatermarkMs() + 1L))
            }
            out.result().iterator
          }
      }
  }

  /** q49's streaming twin: per-user path steps emitted incrementally.
    * State is the user's LAST event only — O(1) per user — and each
    * consecutive (src, dst) pair goes out as an immutable append-mode
    * fact; the Markov rollup (counts, conditional probabilities) is
    * ordinary downstream aggregation over these facts (the q45
    * foreachBatch pattern). Same in-order-arrival equivalence contract
    * as [[funnelProgress]]; idle users evict at
    * watermark + [[FunnelIdleMs]] (dropping a path tail that long
    * cannot pair with anything the batch form would pair it with,
    * because eviction requires the watermark itself to have moved that
    * far past the last event). */
  def transitionSteps(events: Dataset[Event], watermark: String = "10 minutes")(
      implicit spark: SparkSession): Dataset[Transition] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[LastEvent]) =>
          if (it.isEmpty && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // intra-trigger disorder sorts locally; ties break on
            // event_id like the batch lead() window
            val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var last = state.getOption
            val out = Seq.newBuilder[Transition]
            sorted.foreach { e =>
              val t = micros(e.ts)
              last.foreach { l =>
                out += Transition(userId, l.tpe, e.event_type, toTimestamp(t))
              }
              last = Some(LastEvent(e.event_type, t))
            }
            last.foreach { l =>
              state.update(l)
              state.setTimeoutTimestamp(
                Math.floorDiv(l.at + FunnelIdleMs * 1000L + 999L, 1000L))
            }
            out.result().iterator
          }
      }
  }

  /** q53's streaming twin: incremental trailing z-score anomaly
    * detection on per-type daily volumes. ONE stateful operator keyed
    * by event type: state is the open day's running count plus the
    * last <=7 closed observed-day counts; when an event's day advances
    * past the open day, the closed day scores against the ring (the
    * IDENTICAL arithmetic of EventAnalytics.anomalies — integer sums,
    * one fixed double parenthesization, 6-dp HALF_UP round) and is
    * emitted as an immutable append-mode fact. A type's final open day
    * never emits (it is not closed) — the q32/d09 in-order contract,
    * pinned stream ≡ batch-minus-open-days by the MemoryStream spec.
    *
    * State is O(types × 8 longs) — bounded by the type vocabulary, not
    * event volume — so no timeout-eviction is needed (types recur
    * forever; evicting one would mis-score its next day against an
    * empty ring).
    */
  def anomalyFacts(events: Dataset[Event], watermark: String = "10 minutes")(
      implicit spark: SparkSession): Dataset[AnomalyFact] = {
    import spark.implicits._
    val lookback = 7
    def score(ring: Seq[Long], cnt: Long): (Option[Double], Option[Int]) =
      if (ring.size < lookback) (None, None)
      else {
        val s = ring.sum.toDouble
        val s2 = ring.map(c => c * c).sum.toDouble
        val variance = s2 / lookback.toDouble -
          (s / lookback.toDouble) * (s / lookback.toDouble)
        if (variance > 0.0) {
          val z = (cnt.toDouble - s / lookback.toDouble) / math.sqrt(variance)
          val zr = BigDecimal(z)
            .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
          (Some(zr), Some(if (math.abs(z) > 3.0) 1 else 0))
        } else (None, None)
      }
    def dayStr(epochDay: Long): String =
      java.time.LocalDate.ofEpochDay(epochDay).toString
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[VolumeState, AnomalyFact](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[Event], state: GroupState[VolumeState]) =>
          val days = it.map(e => Math.floorDiv(micros(e.ts), 86400000000L))
            .toSeq.sorted
          if (days.isEmpty) Iterator.empty
          else {
            var st = state.getOption.getOrElse(VolumeState(days.head, 0L, Nil))
            val out = Seq.newBuilder[AnomalyFact]
            days.foreach { d =>
              // d < openDay = cross-trigger late data beyond the
              // in-order contract: dropped, the watermark semantic
              if (d >= st.openDay) {
                if (d > st.openDay) {
                  val (z, flag) = score(st.ring, st.openCnt)
                  out += AnomalyFact(tpe, dayStr(st.openDay), st.openCnt, z, flag)
                  st = VolumeState(d, 0L,
                    (st.ring :+ st.openCnt).takeRight(lookback))
                }
                st = st.copy(openCnt = st.openCnt + 1)
              }
            }
            state.update(st)
            out.result().iterator
          }
      }
  }

  /** q58's streaming twin: incremental heartbeat-gap detection. State
    * per key is ONE long (the last event time); a gap of at least
    * `minGapUs` between consecutive events emits the closed silence as
    * an append-mode fact — the same spans the batch lead() window
    * finds, minus any still-open trailing silence (an open gap has no
    * end until the next event arrives; a production alarm would pair
    * this with an event-time timeout for live paging, which is
    * deliberately NOT emitted here because timeout firings depend on
    * trigger timing and would break stream ≡ batch determinism).
    */
  def silenceFacts(events: Dataset[Event], minGapUs: Long,
      watermark: String = "10 minutes")(
      implicit spark: SparkSession): Dataset[Silence] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[LastEvent, Silence](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Event], state: GroupState[LastEvent]) =>
          val times = it.map(e => micros(e.ts)).toSeq.sorted
          if (times.isEmpty) Iterator.empty
          else {
            var last = state.getOption.map(_.at)
            val out = Seq.newBuilder[Silence]
            times.foreach { t =>
              last.foreach { l =>
                if (t - l >= minGapUs) out += Silence(key, l, t, t - l)
              }
              // cross-trigger stragglers older than the frontier keep
              // the frontier (max) — the in-order contract's late-drop
              last = Some(last.fold(t)(math.max(_, t)))
            }
            state.update(LastEvent("", last.get))
            out.result().iterator
          }
      }
  }
}
