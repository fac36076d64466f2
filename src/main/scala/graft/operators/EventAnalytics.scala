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

  /** The default funnel step types, in order (the fixture's
    * view→click→purchase journey); queries and the streaming twin
    * share this definition. */
  val FunnelSteps: Seq[String] = Seq("view", "click", "purchase")

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
    // Column-level fold, no SQL-string interpolation: step names bind as
    // literals (a step containing a quote cannot break or alter the
    // expression), and the "next expected step" is an array lookup —
    // which also makes REPEATED step names (view→view→purchase) work,
    // where a per-step CASE on the name alone could not distinguish
    // occurrences. -1 sentinel: below any post-epoch timestamp.
    val stepsArr = array(steps.map(lit): _*)
    val init = struct(lit(0).cast("int").as("stage"), lit(-1L).as("at"))
    val stage = aggregate(
      col("seq"), init,
      (acc, x) => {
        // get() is 0-based and NULL-safe past the last step (element_at
        // would THROW under ANSI once the funnel completes)
        val advance = x.getField("event_type") ===
          get(stepsArr, acc.getField("stage")) &&
          x.getField("t") > acc.getField("at")
        when(advance, struct(
          (acc.getField("stage") + 1).cast("int").as("stage"),
          x.getField("t").as("at")))
          .otherwise(acc)
      },
      acc => acc.getField("stage"))
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

  /** Last-touch attribution: each conversion event is credited to the
    * nearest preceding non-conversion event of the same user (ordered
    * by time, then `tieCol` for determinism), rolled up to per-channel
    * conversion counts and exact-decimal attributed value. Conversions
    * with no preceding touch credit the `direct` channel.
    *
    * Scale shape: ONE corpus shuffle — the user-partitioned window
    * (same key the sessionizer and funnel use, so a pre-bucketed event
    * log re-sorts without exchanging) — then a channel-cardinality
    * rollup with map-side partials. The attributed-value sum follows
    * the dsum discipline (inputs rounded once to 4 decimals, summed as
    * exact decimal) so the double is order-independent and
    * engine-identical.
    */
  def attribution(events: DataFrame, userCol: Column, tsCol: Column,
                  typeCol: Column, tieCol: Column, valueCol: Column,
                  convertType: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy("__u").orderBy(col("__ts"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(userCol.as("__u"), tsCol.as("__ts"), tieCol.as("__tie"),
        typeCol.as("__type"), valueCol.as("__v"))
      .withColumn("touch",
        last(when(col("__type") =!= convertType, col("__type")),
          ignoreNulls = true).over(w))
      .filter(col("__type") === convertType)
      .groupBy(coalesce(col("touch"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("conversions"),
        sum(col("__v").cast(DecimalType(28, 4))).cast("double").as("attributed_value"))
  }

  /** Trailing z-score anomaly detection over the daily event-volume
    * series: per event type, each day's count is scored against the
    * trailing `lookback` observed days' mean and population deviation;
    * |z| above `zThresh` flags the day. Days without a full trailing
    * window score NULL (no verdict on thin history), as does a
    * zero-variance window (the q50 discipline: the guard lives IN the
    * sqrt argument, so ANSI never divides by a hoisted zero).
    *
    * Scale shape: the corpus aggregates to the (type, day) series
    * first — ONE shuffle, map-side partials — and the window runs on
    * that series partitioned by type, never globally. Mean/variance
    * derive from integer window sums through one fixed double
    * parenthesization, so scores are engine-identical.
    */
  def anomalies(events: DataFrame, typeCol: Column, tsCol: Column,
                lookback: Int = 7, zThresh: Double = 3.0): DataFrame = {
    val daily = events
      .groupBy(typeCol.as("event_type"), to_date(tsCol).as("__day"))
      .agg(count(lit(1)).as("cnt"))
    val win = Window.partitionBy("event_type").orderBy("__day")
      .rowsBetween(-lookback, -1)
    val n = count(col("cnt")).over(win)
    val s = sum(col("cnt")).over(win).cast("double")
    val s2 = sum(col("cnt") * col("cnt")).over(win).cast("double")
    val m = s / lookback.toDouble
    val variance = s2 / lookback.toDouble - (s / lookback.toDouble) * (s / lookback.toDouble)
    val z = (col("cnt").cast("double") - m) / sqrt(when(variance > 0.0, variance))
    // the flag is a nullable INT, not BOOLEAN: a NULL boolean
    // round-trips as None via parquet/pandas but NaN via DuckDB's
    // result path, so the tri-state verdict would hash-mismatch
    daily
      .select(col("event_type"), col("__day"), col("cnt"),
        when(n === lookback, round(z, 6)).as("z"),
        when(n === lookback, (abs(z) > zThresh).cast("int")).as("is_anomaly"))
      .select(col("event_type"), date_format(col("__day"), "yyyy-MM-dd").as("day"),
        col("cnt"), col("z"), col("is_anomaly"))
  }

  /** Heartbeat-gap (silence) detection: per key, the spans where the
    * event stream went quiet for at least `minGapUs` — the data-
    * freshness monitor an ingestion pipeline alarms on. Output spans
    * are exact epoch-micros longs so no timestamp formatting can blur
    * two engines' results. `EventStreams.silenceFacts` is the
    * incremental streaming twin.
    *
    * Scale shape — the BLOCKED discipline (q29/p09): a flat
    * lead() over `partitionBy(key)` would sort each key's ENTIRE
    * stream in one task, and a monitoring key space is small (a
    * handful of event types over billions of rows = one straggler
    * task per type). Instead consecutive pairs split exactly into
    * (a) intra-day pairs — the window partitions by (key, DAY), so a
    * task sorts at most one key-day — and (b) day-boundary pairs,
    * stitched from per-block min/max on the (key, day) rollup (a
    * days-sized table). Their union is provably the flat form's pair
    * set, so the semantics (and the oracle, which runs the flat
    * window) are unchanged.
    */
  def silences(events: DataFrame, keyCol: Column, tsCol: Column,
               tieCol: Column, minGapUs: Long): DataFrame = {
    val DayUs = 86400000000L
    val e = events
      .select(keyCol.as("__k"), unix_micros(tsCol).as("__us"), tieCol.as("__tie"))
      .withColumn("__day", floor(col("__us") / DayUs))
    val wBlk = Window.partitionBy("__k", "__day").orderBy(col("__us"), col("__tie"))
    val intra = e
      .withColumn("__nxt", lead(col("__us"), 1).over(wBlk))
      .filter(col("__nxt").isNotNull && col("__nxt") - col("__us") >= minGapUs)
      .select(col("__k"), col("__us"), col("__nxt"))
    val wKey = Window.partitionBy("__k").orderBy("__day")
    val boundary = e.groupBy(col("__k"), col("__day"))
      .agg(min(col("__us")).as("__bmin"), max(col("__us")).as("__bmax"))
      .withColumn("__nmin", lead(col("__bmin"), 1).over(wKey))
      .filter(col("__nmin").isNotNull && col("__nmin") - col("__bmax") >= minGapUs)
      .select(col("__k"), col("__bmax").as("__us"), col("__nmin").as("__nxt"))
    intra.unionByName(boundary)
      .select(col("__k").as("key"), col("__us").as("start_us"),
        col("__nxt").as("end_us"), (col("__nxt") - col("__us")).as("gap_us"))
  }

  /** Cohort lifetime value: q48's weekly cohorts extended with exact-
    * decimal cumulative revenue per cohort user — the LTV matrix a
    * growth dashboard plots. Revenue aggregates once per (cohort,
    * offset) in exact decimal; the cumulative window runs on that
    * cohort-sized table (never the corpus) and stays decimal until the
    * output cast, so running sums are order-independent.
    */
  def cohortLtv(events: DataFrame, userCol: Column, tsCol: Column,
                typeCol: Column, valueCol: Column,
                revenueType: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(28, 4)
    val e = events.select(userCol.as("__u"), tsCol.as("__ts"),
      typeCol.as("__type"), valueCol.as("__v"))
    val first = e.groupBy("__u").agg(date_trunc("week", min(col("__ts"))).as("cw"))
    val sizes = first.groupBy("cw").agg(count(lit(1)).as("cohort_users"))
    val rev = e.filter(col("__type") === revenueType)
      .join(first, "__u")
      .groupBy(col("cw"),
        (datediff(date_trunc("week", col("__ts")).cast("date"), col("cw").cast("date")) / 7)
          .cast("int").as("week_offset"))
      .agg(sum(col("__v").cast(dec)).as("rev_d"))
    val wCum = Window.partitionBy("cw").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, 0)
    rev.join(sizes, "cw")
      .withColumn("cum_d", sum(col("rev_d")).over(wCum))
      .select(
        date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("cohort_users"),
        col("rev_d").cast("double").as("revenue"),
        col("cum_d").cast("double").as("cum_revenue"),
        round(col("cum_d").cast("double") / col("cohort_users").cast("double"), 6)
          .as("ltv_per_user"))
  }

  /** Daily percentile bands (the latency-dashboard p50/p95): per
    * (key, day), the exact discrete percentiles of `valueCol` selected
    * BY RANK — rank ceil(q·n) computed in integer arithmetic
    * ((q·100·n + 99) div 100), ties ordered by `tieCol` — so the
    * selected values are engine-identical with no interpolation-mode
    * ambiguity (DuckDB's quantile_cont and Spark's percentile
    * interpolate differently; rank selection sidesteps both).
    *
    * Scale shape: ONE aggregate over ONE corpus shuffle —
    * `sort_array(collect_list(struct(v, tie)))` per (key, day), ranks
    * read by array index. The round-13 form ranked with a row_number
    * window plus a count window plus a rollup aggregate over the same
    * partitioning; the window machinery (two WindowExec passes and a
    * full partition sort feeding an aggregate that discards all but
    * two rows per group) was 8.7 s at sf10 — this form selects the
    * same values with no window machinery at all. The per-group array is
    * bounded by a day's traffic per key — exactly the working set the
    * rank window sorted per task (the q58 blocked-discipline bound);
    * a corpus whose single key-day exceeds task memory moves to the
    * q54 sketch twin, which is the same escape hatch the windowed
    * form needed.
    */
  def percentileBands(events: DataFrame, keyCol: Column, tsCol: Column,
                      valueCol: Column, tieCol: Column,
                      maxExactGroup: Long = DefaultMaxExactGroup): DataFrame = {
    val prepped = events
      .select(keyCol.as("__k"), to_date(tsCol).as("__day"),
        valueCol.as("__v"), tieCol.as("__tie"))
    // Guard: the array form's aggregation buffer is one (key, day)'s
    // whole traffic and CANNOT spill (an oversized buffer is an OOM,
    // not a slow task), so a cheap pre-count (map-side-combined, tiny
    // shuffle) sizes the hottest group first and a corpus whose
    // hottest key-day exceeds the bound takes the windowed form, which
    // sorts the same working set through WindowExec's spillable path.
    // Both branches are rank-exact — the oracle is unchanged either way.
    // The probe is cached per corpus snapshot (the corpusRowCount
    // discipline: ArtifactStore source fingerprint + canonicalized
    // plan), so only the FIRST invocation per snapshot pays the scan —
    // repeat timed passes, plan dumps, and spec re-runs are a
    // driver-side map hit, zero extra jobs. A regenerated corpus flips
    // the fingerprint, so a stale bound is never served. Fileless
    // frames (nothing stable to key on) probe every call.
    val hotMax = hotGroupMax(prepped)
    if (hotMax <= maxExactGroup) percentileBandsArray(prepped)
    else percentileBandsWindowed(prepped)
  }

  /** fingerprint+plan → hottest (key, day) count. Process-wide,
    * LRU-capped: a long-lived session probing many corpus snapshots
    * must not grow the map without bound. Caveat shared with every
    * mtime-based fingerprint in this repo (ArtifactStore): an IN-PLACE
    * corpus overwrite that preserves both file length and mtime (a
    * same-millisecond rewrite, or a coarse-mtime filesystem) is
    * indistinguishable from the cached snapshot and would serve a
    * stale hot-group bound — which matters here because an understated
    * bound routes an over-limit group into the array branch's
    * unspillable buffer. Snapshot-replacing writers must write to a
    * NEW path (the TableLayout/ObjectStoreCommit discipline) rather
    * than rewrite files in place. */
  private val HotMaxCacheCap = 256
  private val hotMaxCache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, java.lang.Long](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, java.lang.Long]): Boolean =
          size() > HotMaxCacheCap
      })

  /** Size of the hottest (__k, __day) group of `prepped`, cached per
    * corpus snapshot (see [[percentileBands]]). */
  private def hotGroupMax(prepped: DataFrame): Long = {
    def probe(): Long = {
      val hottest = prepped.groupBy(col("__k"), col("__day")).count()
        .agg(max(col("count"))).head()
      if (hottest.isNullAt(0)) 0L else hottest.getLong(0)
    }
    if (prepped.inputFiles.isEmpty) probe()
    else {
      val fp = graft.sources.ArtifactStore.sourceFingerprint(
        prepped, prepped.sparkSession.sparkContext.hadoopConfiguration,
        salt = s"hotgroup:${prepped.queryExecution.optimizedPlan.canonicalized.toString}")
      hotMaxCache.computeIfAbsent(fp, _ => probe()).longValue()
    }
  }

  /** Array branch: ONE aggregate over ONE corpus shuffle —
    * `sort_array(collect_list(struct(v, tie)))` per (key, day), ranks
    * read by array index. size() is INT; the rank arithmetic casts to
    * BIGINT before the multiply for exact parity with the windowed
    * branch's long count (32-bit overflow would need >42.9M rows in
    * one group — past the guard, but the cast makes the two branches
    * identical by construction, not by bound). */
  private def percentileBandsArray(prepped: DataFrame): DataFrame =
    prepped
      .groupBy(col("__k").as("key"), col("__day"))
      .agg(sort_array(collect_list(struct(col("__v"), col("__tie"))))
        .as("__sorted"))
      .select(col("key"),
        date_format(col("__day"), "yyyy-MM-dd").as("day"),
        size(col("__sorted")).cast("long").as("n"),
        expr("__sorted[CAST((50 * CAST(size(__sorted) AS BIGINT) + 99) div 100 AS INT) - 1].__v")
          .as("p50"),
        expr("__sorted[CAST((95 * CAST(size(__sorted) AS BIGINT) + 99) div 100 AS INT) - 1].__v")
          .as("p95"))

  /** Windowed branch (hot-group fallback): the same rank selection via
    * row_number over (key, day) ordered by (v, tie) — one exchange,
    * and WindowExec spills an oversized partition to disk instead of
    * holding it in an aggregation buffer. Slower at normal shapes
    * (full partition sort feeding an aggregate that keeps two rows per
    * group — the measured 8.7 s vs 1.7 s at sf10), which is why it is
    * the guarded branch and not the default. */
  private def percentileBandsWindowed(prepped: DataFrame): DataFrame = {
    val byGroup = Window.partitionBy(col("__k"), col("__day"))
    val ranked = Window.partitionBy(col("__k"), col("__day"))
      .orderBy(col("__v"), col("__tie"))
    prepped
      .withColumn("__rn", row_number().over(ranked).cast("long"))
      .withColumn("__n", count(lit(1)).over(byGroup))
      .withColumn("__r50", expr("(50 * __n + 99) div 100"))
      .withColumn("__r95", expr("(95 * __n + 99) div 100"))
      .where(col("__rn") === col("__r50") || col("__rn") === col("__r95"))
      .groupBy(col("__k").as("key"), col("__day"))
      .agg(max(col("__n")).as("n"),
        max(when(col("__rn") === col("__r50"), col("__v"))).as("p50"),
        max(when(col("__rn") === col("__r95"), col("__v"))).as("p95"))
      .select(col("key"), date_format(col("__day"), "yyyy-MM-dd").as("day"),
        col("n"), col("p50"), col("p95"))
  }

  /** Hottest-(key, day) row count above which [[percentileBands]]
    * abandons the unspillable array aggregate: 4M rows of (double,
    * long) structs is ~100 MB of buffer — well inside one task's heap
    * at the 32-thread/128 GiB profile, with 10x headroom below where
    * collect_list actually dies. */
  val DefaultMaxExactGroup: Long = 4000000L

  /** Time-series resampling: densify a sparse (key, day, value) series
    * onto the full calendar between the series' global min and max
    * day, marking observed cells and filling gaps two ways — LOCF
    * (last observation carried forward) and LINEAR interpolation
    * between the surrounding observed anchors (falling back to
    * LOCF/NOCB at a key's boundary, where only one anchor exists).
    * `series` must carry columns `key`, `day` (DATE), `cnt` (LONG).
    *
    * Scale shape: the calendar is generated from a one-row global
    * envelope crossed with the key vocabulary — both broadcast-tiny —
    * so the only corpus-sized work is the left join back to the series
    * (keyed shuffle) and the per-key windows on the densified series
    * (|keys| x |days| rows, partitioned by key, never global). The
    * interpolation is one fixed double parenthesization over integer
    * anchors, rounded once — engine-identical.
    */
  def fillDaily(series: DataFrame): DataFrame = {
    val spark = series.sparkSession
    val env = series.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val keys = series.select(col("key")).distinct()
    val calendar = keys.crossJoin(broadcast(env))
      .select(col("key"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy("key").orderBy("day")
    val back = w.rowsBetween(Window.unboundedPreceding, 0)
    val fwd = w.rowsBetween(0, Window.unboundedFollowing)
    val joined = calendar.join(series, Seq("key", "day"), "left")
    val obsDay = when(col("cnt").isNotNull, col("day"))
    val df = joined
      .withColumn("locf", last(col("cnt"), ignoreNulls = true).over(back))
      .withColumn("nocb", first(col("cnt"), ignoreNulls = true).over(fwd))
      .withColumn("pd", last(obsDay, ignoreNulls = true).over(back))
      .withColumn("nd", first(obsDay, ignoreNulls = true).over(fwd))
    val linear = when(col("cnt").isNotNull, col("cnt").cast("double"))
      .when(col("pd").isNotNull && col("nd").isNotNull,
        round(col("locf").cast("double") +
          (col("nocb").cast("double") - col("locf").cast("double")) *
            datediff(col("day"), col("pd")).cast("double") /
            datediff(col("nd"), col("pd")).cast("double"), 6))
      .otherwise(coalesce(col("locf"), col("nocb")).cast("double"))
    df.select(col("key"),
      date_format(col("day"), "yyyy-MM-dd").as("day"),
      col("cnt").isNotNull.cast("int").as("observed"),
      col("cnt"),
      coalesce(col("locf"), col("nocb")).as("locf"),
      linear.as("filled"))
  }

  /** Two-proportion z-test over a deterministic 50/50 experiment split:
    * users hash into arms (md5 — rerun-stable, uncorrelated with any
    * business key), convert if they ever emit `convertType`, and the
    * pooled z-statistic compares the arms' conversion rates.
    *
    * Scale shape: one user-keyed aggregate (corpus shuffle) → a 2-row
    * arm rollup → scalar arithmetic. Every input to the z expression is
    * an exact integer count, and the expression is one fixed
    * parenthesization of double ops, so the statistic is
    * engine-identical to the oracle's bit for bit. */
  def abTest(events: DataFrame, userCol: Column, typeCol: Column,
             convertType: String, minCount: Int = 1, salt: String = "ab"): DataFrame = {
    val perUser = events
      .groupBy(userCol.as("__u"))
      .agg((sum(when(typeCol === convertType, 1).otherwise(0)) >= minCount)
        .cast("int").as("converted"))
      .withColumn("arm",
        conv(substring(md5(concat(lit(s"$salt|"), col("__u").cast("string"))), 1, 2), 16, 10)
          .cast("long") % 2)
    val arms = perUser.groupBy("arm")
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("c"))
    val one = arms.agg(
      sum(when(col("arm") === 0, col("n"))).as("n0"),
      sum(when(col("arm") === 0, col("c"))).as("c0"),
      sum(when(col("arm") === 1, col("n"))).as("n1"),
      sum(when(col("arm") === 1, col("c"))).as("c1"))
    val (n0, c0, n1, c1) = (col("n0").cast("double"), col("c0").cast("double"),
      col("n1").cast("double"), col("c1").cast("double"))
    val p0 = c0 / n0
    val p1 = c1 / n1
    val pp = (c0 + c1) / (n0 + n1)
    // degenerate experiments (everyone or no-one converts) have zero
    // pooled variance: the z-test is undefined and must emit NULL.
    // The zero is nulled out IN the denominator (not via an outer
    // CASE): subexpression elimination may hoist a shared z above any
    // wrapping conditional, and ANSI mode then throws on the 0/0
    // before the guard is consulted.
    val denom = sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / n0 + lit(1.0) / n1))
    val z = (p1 - p0) / when(denom > 0.0, denom)
    one.select(
      col("n0"), col("c0"), col("n1"), col("c1"),
      round(p0, 6).as("rate0"), round(p1, 6).as("rate1"),
      round(z, 6).as("z"),
      (abs(z) > 1.96).as("significant"))
  }
}
