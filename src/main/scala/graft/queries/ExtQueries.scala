package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.AsOfJoin
import Ops._

/** Extended relational surface beyond SURVEY.md §2: CUBE, PIVOT, as-of
  * join, range/band join, and deterministic hash sampling — the shapes a
  * warehouse user reaches for right after the core set. Each has a full
  * DuckDB value oracle.
  */
object ExtQueries {

  /** Price bands for the range join: [900+10i, 900+10(i+1)), i ∈ [0,10).
    * Shared constant so the Spark plan and the oracle agree exactly. */
  val NBands = 10
  val BandLo = 900
  val BandWidth = 10

  /** Salt fan-out for q33's two-phase aggregation. */
  val NSalts = 16

  /** q43's attribution window (30 min). */
  val AsOfToleranceMs: Long = 30 * 60 * 1000L

  val defs: Map[String, Q] = Map(
    // CUBE as hierarchical re-aggregation (q20's discipline): native
    // cube Expands every input row once per grouping set (4× the
    // corpus at k=2). COUNT/SUM re-aggregate, so the corpus aggregates
    // ONCE to the finest (event_type, year) grain and all 2^k
    // subtotal levels roll up from that tiny table — shared via the
    // lazy localCheckpoint, decimal-exact until the output cast.
    // Subtotals are tagged with explicit GROUPING() bits, same
    // output contract as before.
    "q24_cube" -> ((s, dir) => {
      val dec = org.apache.spark.sql.types.DecimalType(28, 4)
      val base = events(s, dir).withColumn("y", year(col("ts")))
        .groupBy(col("event_type"), col("y"))
        .agg(count(lit(1)).as("cnt"), sum(col("value").cast(dec)).as("dv"))
        .localCheckpoint(eager = false)
      val l00 = base.select(lit(0).as("gtype"), lit(0).as("gy"),
        col("event_type").as("etype"), col("y"), col("cnt"), col("dv"))
      val l01 = base.groupBy(col("event_type"))
        .agg(sum(col("cnt")).as("cnt"), sum(col("dv")).as("dv"))
        .select(lit(0).as("gtype"), lit(1).as("gy"),
          col("event_type").as("etype"), lit(-1).as("y"), col("cnt"), col("dv"))
      val l10 = base.groupBy(col("y"))
        .agg(sum(col("cnt")).as("cnt"), sum(col("dv")).as("dv"))
        .select(lit(1).as("gtype"), lit(0).as("gy"),
          lit("ALL").as("etype"), col("y"), col("cnt"), col("dv"))
      val l11 = base.agg(sum(col("cnt")).as("cnt"), sum(col("dv")).as("dv"))
        .select(lit(1).as("gtype"), lit(1).as("gy"),
          lit("ALL").as("etype"), lit(-1).as("y"), col("cnt"), col("dv"))
      l00.union(l01).union(l10).union(l11)
        .select(col("gtype"), col("gy"), col("etype"), col("y"),
          col("cnt"), col("dv").cast("double").as("sum_value"))
        .orderSmall("gtype", "gy", "etype", "y")
    }),

    // PIVOT: long→wide reshape. The value list is DECLARED, which keeps
    // the plan a single pass (one partial agg per pivot value, no
    // distinct-values pre-query and no second job at 100 TB).
    "q25_pivot" -> ((s, dir) => {
      val e = events(s, dir)
      e.groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")
    }),

    // as-of join: each click attributed to the same user's most recent
    // prior-or-simultaneous purchase. One shuffle on user_id (see
    // graft.operators.AsOfJoin — no pair explosion).
    "q26_asof_join" -> ((s, dir) => {
      val e = events(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = e.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      AsOfJoin.backward(clicks, purchases,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        payload = Seq("ts", "value"))
        .orderBy("event_id")
    }),

    // as-of join with TOLERANCE: attribution expires after 30 minutes —
    // the nearest prior purchase either qualifies or the click goes
    // unattributed (no fallback to older purchases). Same one-shuffle
    // plan as q26; the tolerance is a map-side mask.
    "q43_asof_tolerance" -> ((s, dir) => {
      val e = events(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = e.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      AsOfJoin.backward(clicks, purchases,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        payload = Seq("ts", "value"), toleranceMs = Some(AsOfToleranceMs))
        .orderBy("event_id")
    }),

    // range (band) join: parts bucketed into price intervals. The band
    // table is tiny and BROADCAST, so the interval predicate runs as a
    // broadcast nested-loop over 10 rows per record — map-side, no
    // shuffle of the fact side, safe at any corpus size.
    "q27_range_join" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val bands = s.range(0, NBands).select(
        col("id").as("band"),
        (lit(BandLo) + col("id") * BandWidth).cast("double").as("lo"),
        (lit(BandLo) + (col("id") + 1) * BandWidth).cast("double").as("hi"))
      p.join(broadcast(bands),
          p("p_retailprice") >= bands("lo") && p("p_retailprice") < bands("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("cnt"), dsum(col("p_retailprice")).as("sum_price"))
        .orderSmall("band")
    }),

    // skew-resistant two-phase (salted) aggregation: a hot grouping key
    // at 100 TB turns one reducer into the straggler. Phase 1 splits
    // every key into NSalts sub-groups (deterministic salt — the salt
    // never reaches the output, so any spreading function works) and
    // aggregates them in parallel; phase 2 merges the tiny partials.
    // Partial sums stay in exact DECIMAL until the final merge, so the
    // result is bit-identical to the plain single-phase GROUP BY — which
    // is exactly what the oracle runs.
    "q33_salted_agg" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      l.withColumn("salt", pmod(col("l_orderkey"), lit(NSalts)))
        .groupBy(col("l_returnflag"), col("salt"))
        .agg(
          sum(col("l_quantity").cast(DecimalType(28, 4))).as("psum"),
          count(lit(1)).as("pcnt"))
        .groupBy("l_returnflag")
        .agg(
          sum(col("psum")).cast("double").as("sum_qty"),
          sum(col("pcnt")).as("cnt"))
        .orderSmall("l_returnflag")
    }),

    // deterministic stratified hash sampling: keep a row iff the first
    // md5 hex digit of its key falls in a fixed set (3/16 ≈ 18.75%).
    // Unlike TABLESAMPLE/rand(), the sample is reproducible across
    // engines, runs, and partitionings — the property a training-data
    // pipeline needs for auditable subsets. Pure map-side filter.
    "q28_sample" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(substring(md5(col("o_orderkey").cast("string")), 1, 1)
          .isin("0", "1", "2"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_sample"), dsum(col("o_totalprice")).as("sum_price"))
        .orderSmall("o_orderstatus")
    }),

    // SCD Type-2 dimension build (graft.operators.Scd): per customer,
    // the order-status observation log collapses into version-numbered
    // validity intervals (NULL valid_to = current). Ties on the order
    // date break by order key in both engines.
    "q52_scd2" -> ((s, dir) =>
      graft.operators.Scd.scd2(t(s, dir, "orders"),
        col("o_custkey"), col("o_orderstatus"),
        col("o_orderdate"), col("o_orderkey"))
        .select(col("key").as("custkey"), col("version"),
          col("attr").as("status"), col("valid_from"), col("valid_to"))
        .orderBy("custkey", "version")))

  val oracles: Map[String, String] = Map(
    "q24_cube" ->
      s"""SELECT CAST(GROUPING(event_type) AS INTEGER) AS gtype,
         |  CAST(GROUPING(y) AS INTEGER) AS gy,
         |  CASE WHEN GROUPING(event_type) = 1 THEN 'ALL' ELSE event_type END AS etype,
         |  CASE WHEN GROUPING(y) = 1 THEN -1 ELSE y END AS y,
         |  COUNT(*) AS cnt, ${sqlDsum("value")} AS sum_value
         |FROM (SELECT event_type, CAST(date_part('year', ts) AS INTEGER) AS y, value
         |      FROM events)
         |GROUP BY CUBE (event_type, y)
         |ORDER BY gtype, gy, etype, y""".stripMargin,

    "q25_pivot" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q26_asof_join" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |     p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, c.ts,
        |       p.ts AS asof_ts, p.value AS asof_value
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,

    "q43_asof_tolerance" ->
      s"""WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
         |     p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
         |     j AS (SELECT c.event_id, c.user_id, c.ts,
         |             p.ts AS p_ts, p.value AS p_value
         |           FROM c ASOF LEFT JOIN p
         |             ON c.user_id = p.user_id AND c.ts >= p.ts)
         |SELECT event_id, user_id, ts,
         |  CASE WHEN ts - p_ts <= INTERVAL ${AsOfToleranceMs / 1000} SECOND
         |       THEN p_ts END AS asof_ts,
         |  CASE WHEN ts - p_ts <= INTERVAL ${AsOfToleranceMs / 1000} SECOND
         |       THEN p_value END AS asof_value
         |FROM j ORDER BY event_id""".stripMargin,

    "q27_range_join" ->
      s"""WITH bands AS (SELECT i AS band,
         |    CAST($BandLo + i * $BandWidth AS DOUBLE) AS lo,
         |    CAST($BandLo + (i + 1) * $BandWidth AS DOUBLE) AS hi
         |  FROM range(0, $NBands) t(i))
         |SELECT band, COUNT(*) AS cnt, ${sqlDsum("p_retailprice")} AS sum_price
         |FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
         |GROUP BY band ORDER BY band""".stripMargin,

    "q33_salted_agg" ->
      s"""SELECT l_returnflag, ${sqlDsum("l_quantity")} AS sum_qty,
         |  COUNT(*) AS cnt
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q28_sample" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_sample,
         |  ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders
         |WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1', '2')
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // q52: identical change detection (lag over the same partition/
    // order), identical version numbering and interval close
    "q52_scd2" ->
      """WITH s AS (SELECT o_custkey AS k, o_orderstatus AS a,
        |    o_orderdate AS d, o_orderkey AS tie,
        |    lag(o_orderstatus) OVER
        |      (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |c AS (SELECT k, a, d, tie FROM s WHERE prev IS NULL OR a <> prev)
        |SELECT k AS custkey,
        |  CAST(row_number() OVER w AS INT) AS version,
        |  a AS status,
        |  strftime(d, '%Y-%m-%d') AS valid_from,
        |  strftime(lead(d) OVER w, '%Y-%m-%d') AS valid_to
        |FROM c
        |WINDOW w AS (PARTITION BY k ORDER BY d, tie)
        |ORDER BY custkey, version""".stripMargin)
}
