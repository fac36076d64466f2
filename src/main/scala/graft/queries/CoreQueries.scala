package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.GraftEngine
import Ops._

/** Core relational surface (SURVEY.md §2 #1–#17), re-expressed as
  * declarative DataFrame plans so Catalyst supplies what the reference
  * implements by hand: predicate/projection pushdown (optimizer.rs),
  * hash vs sort-merge join selection (physical_plan.rs), codegen
  * (gpu-kernel-compiler). Each query has a DuckDB oracle twin in
  * [[CoreQueries.oracles]] with identical column names and ordering.
  */
object CoreQueries {

  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // #1 projection + row-level arithmetic (parser.rs:159-230).
    // NO global orderBy: the driver compare is row-sorted, and a global
    // sort over a map-only child costs DOUBLE the chain — the range
    // partitioner samples the child (executing the scan+project once)
    // before the real pass runs it again; there is no shuffle boundary
    // whose files the sample job could reuse. Measured at sf10: the
    // sort was half the query (round 14).
    "q01_scan_project" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      l.select(
        l("l_orderkey"), l("l_linenumber"),
        (l("l_extendedprice") * (lit(1.0) - l("l_discount"))).as("revenue"),
        (l("l_extendedprice") * (lit(1.0) - l("l_discount")) * (lit(1.0) + l("l_tax"))).as("charge"))
    }),

    // #2 compound filter: comparisons + AND/OR + date range (executor.rs:443-476)
    "q02_filter" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      l.filter(
        l("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          l("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          l("l_discount") > 0.03 &&
          (l("l_returnflag") === "R" || l("l_quantity") < 10))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")
    }),

    // #3 grouped aggregation, TPC-H Q1 shape (executor.rs:297-355)
    // scan fan-out: three exact-decimal sum chains per row above a
    // serial single-file scan (ABBA A/B min 0.66 -> 0.58 s, fan ≤ base
    // in 5 of 6 interleaved pairs — the h01/q57 shape, smaller margin)
    "q03_agg" -> ((s, dir) => {
      val l = fanScan(t(s, dir, "lineitem"))
      l.filter(l("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderSmall("l_returnflag", "l_linestatus")
    }),

    // #4 COUNT(DISTINCT) (python_usage.py:231-232)
    "q04_count_distinct" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("uniq_cust"), count(lit(1)).as("cnt"))
        .orderSmall("o_orderstatus")
    }),

    // #5 inner equi-join (reference radix hash join, executor.rs:220-265).
    // No broadcast hint: customer is fact-sized at the 100 TB design
    // point, so the build-side choice is left to CBO/AQE — broadcast
    // below autoBroadcastJoinThreshold, shuffled-hash/SMJ above it.
    "q05_join_inner" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select(o("o_orderkey"), c("c_name"), o("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // #6 LEFT outer join (logical_plan.rs:52-58)
    "q06a_join_left" -> ((s, dir) => {
      val n = t(s, dir, "nation")
      val su = t(s, dir, "supplier")
      n.join(su, su("s_nationkey") === n("n_nationkey"), "left")
        .groupBy("n_name").agg(count(col("s_suppkey")).as("supp_cnt"))
        .orderSmall("n_name")
    }),

    // #6 RIGHT outer join — same semantics written from the other side
    "q06b_join_right" -> ((s, dir) => {
      val n = t(s, dir, "nation")
      val su = t(s, dir, "supplier")
      su.join(n, su("s_nationkey") === n("n_nationkey"), "right")
        .groupBy("n_name").agg(count(col("s_suppkey")).as("supp_cnt"))
        .orderSmall("n_name")
    }),

    // #6 FULL outer join over derived aggregates (+ #13 derived tables)
    "q06c_join_full" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val f = o.filter(col("o_orderstatus") === "F").groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt_f")).withColumnRenamed("o_custkey", "fk")
      val p = o.filter(col("o_orderstatus") === "O").groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt_o")).withColumnRenamed("o_custkey", "ok")
      f.join(p, f("fk") === p("ok"), "full")
        .select(
          coalesce(f("fk"), p("ok")).as("custkey"),
          coalesce(f("cnt_f"), lit(0L)).as("cnt_f"),
          coalesce(p("cnt_o"), lit(0L)).as("cnt_o"))
        .orderBy("custkey")
    }),

    // #7 multi-way join + agg, TPC-H Q5 shape (python_usage.py:226-245).
    // region/nation broadcast; fact-fact joins shuffle on keys with AQE.
    "q07_multijoin" -> ((s, dir) => {
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val su = t(s, dir, "supplier")
      // Declared join order = selectivity order, the STAT-LESS
      // fallback: region('ASIA') cuts nation 5x and supplier with it,
      // so lineitem shrinks ~5x at its FIRST join — before the orders
      // shuffle — instead of running the full 60M x 15M merge join and
      // discarding 80% afterwards (measured at sf10: 11.4 s -> see
      // SCALE.md round 15). In CBO mode (Verify/Bench: Ops.t resolves
      // stats-backed catalog relations) the declared order is
      // irrelevant: the chain is deliberately HINT-FREE so
      // CostBasedJoinReorder can flatten and reorder all six relations
      // (a broadcast() hint would fence its join out of the reorderable
      // set) — CboSpec pins that a worst-declared-order variant
      // optimizes to the identical plan. Region/nation are fixed-size
      // (5/25 rows at ANY scale factor), so size-based planning
      // broadcasts them without a hint on both the stat-less and
      // stats-fed paths; the filtered supplier side is likewise left
      // to size-based planning + AQE so a 100 TB supplier table
      // degrades to a shuffle join, not an OOM.
      val asiaSu = su
        .join(n, su("s_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
      l.join(asiaSu, l("l_suppkey") === su("s_suppkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey") && c("c_nationkey") === su("s_nationkey"))
        .groupBy("n_name")
        .agg(dsum(l("l_extendedprice") * (lit(1.0) - l("l_discount"))).as("revenue"))
        .orderSmall("n_name")
    }),

    // #8 sort-merge join strategy (executor.rs:271-291) — forced via hint
    "q08_join_sortmerge" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "MACHINERY").hint("merge")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select(o("o_orderkey"), c("c_name"), o("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // #9 ORDER BY DESC + LIMIT → Spark plans a TakeOrderedAndProject
    // (distributed top-k, no global sort — the scale-safe plan)
    "q09_topk" -> ((s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)),

    // #10 HAVING (python_usage.py:174,243)
    "q10_having" -> ((s, dir) =>
      t(s, dir, "part")
        .groupBy("p_brand")
        .agg(count(lit(1)).as("cnt"), dsum(col("p_retailprice")).as("sum_price"))
        .filter(col("cnt") > 7)
        .orderSmall("p_brand")),

    // #11 temporal extraction + grouping (python_usage.py:277-284 date_part)
    "q11_date_part" -> ((s, dir) => {
      val e = events(s, dir)
      e.groupBy(
        year(col("ts")).as("y"), month(col("ts")).as("m"),
        dayofmonth(col("ts")).as("d"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
        .orderSmall("y", "m", "d", "event_type")
    }),

    // #12 global aggregate, no GROUP BY (rust_usage.rs:162)
    "q12_global_agg" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      l.agg(
        count(lit(1)).as("cnt"),
        dsum(col("l_extendedprice")).as("sum_price"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        davg(col("l_discount")).as("avg_disc"))
    }),

    // #13 derived-table subquery + join against its aggregate
    "q13_subquery" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val avgs = p.groupBy(col("p_brand").as("b"))
        .agg(davg(col("p_retailprice")).as("avg_price"))
      p.join(broadcast(avgs), p("p_brand") === avgs("b"))
        .filter(p("p_retailprice") > avgs("avg_price"))
        .groupBy("p_brand").agg(count(lit(1)).as("n_above"))
        .orderSmall("p_brand")
    }),

    // #14 SQL-string API via GraftEngine (lib.rs execute_query)
    "q14_sql_api" -> ((s, dir) => {
      val e = new GraftEngine(s)
      e.loadTable("lineitem", s"$dir/lineitem.parquet")
      e.sql(
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
          |FROM lineitem GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    }),

    // semi/anti joins — EXISTS / NOT EXISTS as physical join types: the
    // probe side streams once, no duplication from the build side, and
    // the anti case is the classic "customers with no orders" shape
    "q22_semi_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      val withF = c.join(o, c("c_custkey") === o("o_custkey"), "leftsemi")
        .withColumn("side", lit("has_f"))
      val withoutF = c.join(o, c("c_custkey") === o("o_custkey"), "leftanti")
        .withColumn("side", lit("no_f"))
      withF.unionAll(withoutF)
        .groupBy("side", "c_mktsegment").agg(count(lit(1)).as("cnt"))
        .orderSmall("side", "c_mktsegment")
    }),

    // string-function surface: LIKE, substring, concat, upper, length
    "q23_strfuncs" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      c.filter(col("c_name").like("%1%"))
        .select(
          col("c_custkey"),
          upper(substring(col("c_name"), 1, 8)).as("prefix"),
          concat(col("c_mktsegment"), lit("/"), col("c_name")).as("tagged"),
          length(col("c_name")).as("name_len"))
    }),

    // OLAP hierarchy rollup: subtotals per (flag, status), per flag, and
    // grand total in ONE pass (Expand + single shuffle — no N separate
    // aggregations). Subtotal rows are tagged with explicit GROUPING()
    // bits (gflag/gstatus) rather than a sentinel key value, so a
    // genuine NULL or literal 'ALL' in the data stays distinguishable
    // from rollup-generated subtotals.
    // q20: ROLLUP as hierarchical RE-AGGREGATION, not Expand. Spark
    // executes a native rollup by Expand-ing every input row once per
    // grouping set — a 3× corpus scan cost at 100 TB. SUM/COUNT are
    // re-aggregable, so the corpus is aggregated ONCE to the finest
    // (flag, status) grain and the coarser levels roll up from that
    // group-cardinality table (re-aggs on ~6 rows). The base aggregate
    // is shared via the lazy-localCheckpoint idiom (d10's discipline —
    // the union's three branches prune differently, which defeats
    // exchange-reuse canonicalization, so without materialization the
    // corpus would scan three times anyway). The quantity sum stays
    // DECIMAL through every level (exact, associative — the double
    // cast happens only on output), so the result is bitwise the
    // oracle's single-pass ROLLUP.
    "q20_rollup" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val dec = org.apache.spark.sql.types.DecimalType(28, 4)
      val base = l.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast(dec)).as("dq"), count(lit(1)).as("cnt"))
        .localCheckpoint(eager = false)
      val lvl0 = base.select(
        lit(0).as("gflag"), lit(0).as("gstatus"),
        col("l_returnflag").as("flag"), col("l_linestatus").as("status"),
        col("dq"), col("cnt"))
      val lvl1 = base.groupBy(col("l_returnflag"))
        .agg(sum(col("dq")).as("dq"), sum(col("cnt")).as("cnt"))
        .select(lit(0).as("gflag"), lit(1).as("gstatus"),
          col("l_returnflag").as("flag"), lit("ALL").as("status"),
          col("dq"), col("cnt"))
      val lvl2 = base
        .agg(sum(col("dq")).as("dq"), sum(col("cnt")).as("cnt"))
        .select(lit(1).as("gflag"), lit(1).as("gstatus"),
          lit("ALL").as("flag"), lit("ALL").as("status"), col("dq"), col("cnt"))
      lvl0.union(lvl1).union(lvl2)
        .select(col("gflag"), col("gstatus"), col("flag"), col("status"),
          col("dq").cast("double").as("sum_qty"), col("cnt"))
        .orderSmall("gflag", "gstatus", "flag", "status")
    }),

    // set operations: INTERSECT / EXCEPT between customer segments
    "q21_setops" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      def custs(status: String) =
        o.join(c, o("o_custkey") === c("c_custkey"))
          .filter(col("o_orderstatus") === status)
          .select(col("c_custkey"), col("c_mktsegment"))
      val both = custs("F").intersect(custs("O"))
      val onlyF = custs("F").except(custs("O"))
      both.withColumn("side", lit("both"))
        .unionAll(onlyF.withColumn("side", lit("only_f")))
        .groupBy("side", "c_mktsegment").agg(count(lit(1)).as("cnt"))
        .orderSmall("side", "c_mktsegment")
    }),

    // approximate sketches: HyperLogLog++ distinct counts and t-digest-
    // style quantiles — the constant-memory aggregates a 100 TB rollup
    // uses where exact DISTINCT/median would shuffle the world.
    // ERROR-BOUNDED ORACLE (round-6 verdict item 2): approx values are
    // algorithm-specific, so instead of emitting them the query emits a
    // deterministic VERDICT per group — `users_ok` holds iff the HLL
    // estimate is within 3·rsd (rsd=0.05 default → 15%) of the exact
    // distinct count, `median_ok` iff the approx median's value-rank
    // interval [count(<m), count(<=m)] intersects the true median rank
    // band ±1% (percentile_approx accuracy 10000 guarantees rank error
    // ≤ 1e-4·n, so 1% is 100× slack and the verdict is stable). The
    // DuckDB oracle computes the exact columns and asserts TRUE — a
    // sketch outside its error budget now FAILS the driver hash gate
    // instead of hiding behind a rows-only check.
    "q19_sketches" -> ((s, dir) => {
      val e = events(s, dir)
      val agg = e.groupBy("event_type")
        .agg(
          approx_count_distinct(col("user_id")).as("approx_users"),
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("approx_median"),
          countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("cnt"))
      // second scan ranks each group's approx median against the raw
      // values — the 5-row agg side broadcasts, no extra shuffle
      val ranks = e.join(
          broadcast(agg.select(col("event_type").as("et"), col("approx_median"))),
          col("event_type") === col("et"))
        .groupBy("event_type")
        .agg(
          sum(when(col("value") < col("approx_median"), 1L).otherwise(0L)).as("lo"),
          sum(when(col("value") <= col("approx_median"), 1L).otherwise(0L)).as("hi"))
        .withColumnRenamed("event_type", "et2")
      agg.join(broadcast(ranks), col("event_type") === col("et2"))
        .select(col("event_type"), col("n_users"), col("cnt"),
          (abs(col("approx_users") - col("n_users")) <= col("n_users") * 0.15)
            .as("users_ok"),
          (col("lo") <= col("cnt") * 0.51 && col("hi") >= col("cnt") * 0.49)
            .as("median_ok"))
        .orderSmall("event_type")
    }),

    // extended window-function surface: ntile bucketing, lag/lead
    // offsets, and a bounded moving average — one shuffle on the
    // partition key, every function sharing the same window frame scan.
    // The moving average divides an exact decimal sum by the frame row
    // count so the doubles match the oracle bit-for-bit.
    "q34_window_suite" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val frame = w.rowsBetween(-2, 0)
      o.select(
        col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        (sum(col("o_totalprice").cast(DecimalType(28, 4))).over(frame).cast("double")
          / count(lit(1)).over(frame)).as("avg3"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // mergeable-sketch rollup: per-day HLL sketches (the incrementally
    // maintained pre-aggregate a 100 TB deployment stores) are UNIONED
    // into the global distinct estimate without rescanning raw events —
    // re-aggregability is the property that separates sketches from
    // plain approx answers. ERROR-BOUNDED ORACLE (round-6 verdict item
    // 2): the unioned estimate is checked against the exact distinct
    // count within 5% (lgK=12 Datasketches HLL: rse ≈ 1.04/√4096 ≈
    // 1.6%, so 5% is a 3σ budget) and the VERDICT ships in the row;
    // DuckDB computes the exact columns and asserts TRUE.
    "q42_sketch_union" -> ((s, dir) => {
      val e = events(s, dir)
      val daily = e.groupBy(to_date(col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"), count(lit(1)).as("n"))
      val unioned = daily.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users_total"),
        sum(col("n")).as("n_events"))
      val exact = e.agg(countDistinct(col("user_id")).as("n_users"))
      unioned.crossJoin(exact)
        .select(col("n_users"), col("n_events"),
          (abs(col("approx_users_total") - col("n_users")) <= col("n_users") * 0.05)
            .as("union_ok"))
    }),

    // approximate quantiles at scale: percentile_approx (Spark's
    // GK-sketch aggregate — mergeable, one pass, O(accuracy) state per
    // task) with its published rank guarantee VERIFIED against the
    // data: for each requested quantile q the returned value's rank
    // must lie within n/accuracy of q*n (checked via two conditional
    // counts — rank_lt <= ceil((q+eps)n) and rank_le >= floor((q-eps)n)).
    // Complements q29's exact blocked-histogram percentiles: the
    // sketch is what a 10^12-row column runs when exact is too
    // expensive; q42's verdict discipline makes it oracle-checkable.
    "q54_quantile_sketch" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val qs = Seq(0.25, 0.5, 0.75, 0.95)
      val acc = 10000
      val eps = 1.0 / acc
      val sk = l.agg(
        percentile_approx(col("l_extendedprice"),
          array(qs.map(lit): _*), lit(acc)).as("ap"),
        count(lit(1)).as("n"))
      val counts = l.crossJoin(broadcast(sk)).agg(
        max(col("n")).as("n"),
        (qs.indices.flatMap(i => Seq(
          sum(when(col("l_extendedprice") < element_at(col("ap"), i + 1), 1L)
            .otherwise(0L)).as(s"lt$i"),
          sum(when(col("l_extendedprice") <= element_at(col("ap"), i + 1), 1L)
            .otherwise(0L)).as(s"le$i")))): _*)
      counts.select(
        col("n") +:
          qs.zipWithIndex.map { case (q, i) =>
            ((col(s"lt$i") <= ceil((lit(q) + lit(eps)) * col("n"))) &&
              (col(s"le$i") >= floor((lit(q) - lit(eps)) * col("n"))))
              .cast("int").as(s"ok_p${(q * 100).toInt}")
          }: _*)
    }),

    // chi-square test of independence between two categorical columns
    // (order priority x order status) — the contingency-table readout
    // an experimentation/BI surface serves next to q50's z-test. ONE
    // corpus aggregate to the r x c cell table (15 rows); marginals,
    // expectations, and the statistic are window/scalar arithmetic on
    // that tiny table. Exact integer counts feed one fixed double
    // parenthesization per term, terms round to 6 dp and sum as exact
    // DECIMAL → engine-identical statistic; df = (r-1)(c-1) and the
    // 0.05 critical-value verdict come along for free.
    "q56_chi2" -> ((s, dir) => {
      val dec6 = DecimalType(28, 6)
      val cells = t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("p"), col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("o"))
      val wp = Window.partitionBy("p")
      val ws = Window.partitionBy("st")
      val wAll = Window.partitionBy()
      val terms = cells
        .withColumn("rp", sum("o").over(wp))
        .withColumn("cs", sum("o").over(ws))
        .withColumn("n", sum("o").over(wAll))
        .withColumn("e",
          col("rp").cast("double") * col("cs").cast("double") / col("n").cast("double"))
        .withColumn("term",
          round((col("o").cast("double") - col("e")) *
            (col("o").cast("double") - col("e")) / col("e"), 6))
      terms.agg(
        max(col("n")).as("n"),
        countDistinct(col("p")).as("r"),
        countDistinct(col("st")).as("c"),
        sum(col("term").cast(dec6)).cast("double").as("chi2"))
        .select(col("n"), col("chi2"),
          ((col("r") - 1) * (col("c") - 1)).cast("int").as("df"),
          // chi2 critical value at alpha=0.05, df=8 (5x3 table)
          (col("chi2") > 15.507).cast("int").as("significant"))
    }),

    // per-group Pearson correlation + OLS regression line (quantity vs
    // extended price per return flag) — the regr_slope/corr analytics
    // pair, computed from ONE aggregate of exact-decimal power sums
    // (inputs quantized once to 4 dp; products of DECIMAL(18,4) stay
    // exact at scale 8 in both engines' decimal rules) so the closed
    // forms evaluate on engine-identical doubles. One corpus shuffle
    // on the 3-value grouping key; nothing wider than the group count
    // afterwards.
    "q57_corr_ols" -> ((s, dir) => corrOls(s, dir, exactDecimal = true)),

    // bag-semantics set operations: INTERSECT ALL / EXCEPT ALL keep
    // multiplicities (min / clamped difference of per-value counts),
    // which Catalyst plans as one aggregation counting per side — no
    // row-by-row matching. Complements q21's set-semantics pair.
    "q40_bag_setops" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      def side(status: String) =
        o.filter(col("o_orderstatus") === status).select("o_orderpriority")
      side("F").intersectAll(side("O")).withColumn("side", lit("both"))
        .unionAll(side("F").exceptAll(side("O")).withColumn("side", lit("only_f")))
        .groupBy("side", "o_orderpriority").agg(count(lit(1)).as("cnt"))
        .orderSmall("side", "o_orderpriority")
    }),

    // pagination: ORDER BY ... LIMIT/OFFSET with a unique-key tiebreak
    // (without it, page boundaries are nondeterministic across runs and
    // engines). Spark still plans the limit+offset as a single
    // TakeOrdered-style global top-(offset+limit), never a full sort.
    "q41_pagination" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .offset(100).limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")),

    // multiple DISTINCT aggregates in one pass: Catalyst rewrites them
    // with a single Expand (one replica per distinct column) + two-level
    // aggregation — one query-shaped scan instead of N self-joins, the
    // multi-distinct plan every OLAP engine special-cases.
    "q39_multi_distinct" -> ((s, dir) => {
      // Two COUNT(DISTINCT x) on different columns in one aggregate
      // force an Expand that triples every input row through the
      // shuffle. Splitting into single-distinct branches keeps each
      // branch a plain two-phase aggregate (partial dedup map-side, no
      // Expand), then joins the 3-row results on the group key. Three
      // column-pruned scans of lineitem cost less than 3x the rows
      // through one shuffle — and at 100 TB the dedup'd branch shuffles
      // are bounded by |distinct pairs|, not by 3x table size.
      // (one distinct + plain aggs plans Expand-free via
      // planAggregateWithOneDistinct, so the plain aggs ride the first
      // branch for free — two branches total)
      val l = t(s, dir, "lineitem")
      val sup = l.groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
          count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
      val ord = l.groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("n_orders"))
      sup.join(ord, "l_returnflag")
        .select(col("l_returnflag"), col("n_suppliers"), col("n_orders"),
          col("n_rows"), col("sum_qty"))
        .orderSmall("l_returnflag")
    }),

    // explicit NULL ordering: the left join leaves customers without
    // orders at max_price = NULL; NULLS FIRST puts them at the head of
    // the limited result, so the LIMIT's row selection (not just its
    // presentation order) depends on honoring the null placement — an
    // ordering-semantics check the row-canonicalizing driver hash would
    // otherwise never see.
    "q37_null_ordering" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(c("c_custkey"))
        .agg(max(o("o_totalprice")).as("max_price"))
        .orderBy(col("max_price").asc_nulls_first, col("c_custkey").asc)
        .limit(50)
    }),

    // correlated scalar subquery (decorrelated by Catalyst into a left
    // outer aggregate join — the declarative form is the point: the
    // user writes the subquery, the optimizer picks the join plan)
    "q35_corr_subquery" -> ((s, dir) => {
      val c = t(s, dir, "customer"); c.createOrReplaceTempView("customer_v")
      val o = t(s, dir, "orders"); o.createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT c_custkey, c_mktsegment,
          (SELECT COUNT(*) FROM orders_v o WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer_v c
        ORDER BY c_custkey""")
    }),

    // exact percentiles/median, computed on the VALUE HISTOGRAM rather
    // than with the `percentile` aggregate: groupBy(key, value) shrinks
    // the corpus to |distinct values| rows with map-side partial counts,
    // cumulative ranks assign via a BLOCKED prefix sum, and the
    // interpolation row pair for each quantile is picked declaratively —
    // each histogram row contributes v·(1−frac) if it holds the lower
    // rank and v·frac if the upper (same row when the rank is integral).
    // Identical values to the sorted-list definition (and DuckDB's
    // quantile_cont, modulo the 6-dp round) without the `percentile`
    // aggregate's per-group value buffers, whose single-threaded
    // per-group merge was 8× slower at sf0.1.
    //
    // The blocked prefix sum (p05's pattern): a window partitioned by
    // the GROUP key alone caps parallelism at |groups| (4 return flags
    // = 4 tasks forever, any cluster size — the round-5 scale flaw of
    // this query). Instead each histogram row hashes to a value-range
    // block; per-(group, block) subtotals roll up into block offsets
    // with one window over |groups|·|blocks| rows (tiny), and the
    // within-block cumulative windows run in parallel across
    // |groups|·|blocks| partitions. Same exact counts, parallelism
    // decoupled from group cardinality. The APPROXIMATE sketch (q19)
    // remains the default for unbounded value domains; this is the
    // exact path when you need true quantiles.
    "q29_percentiles" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val nBlocks = 64
      // the histogram feeds FOUR consumers (envelope, block offsets,
      // totals, cumulative ranks); planned lazily that is four
      // corpus scan+agg subtrees and AQE's stage cache only reused
      // one of them (measured: 8 scans in the executed plan). One
      // eager checkpoint = one corpus read, and every consumer runs
      // over the |distinct (flag, value)|-row histogram — the piece
      // that must not be re-read 4× at 100 TB.
      val hist = l.groupBy(col("l_returnflag"), col("l_extendedprice").as("v"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint(eager = false) // materialized by the first consumer
      // value-range blocks from the global price envelope (one tiny agg,
      // broadcast): block index is monotone in v, so per-block prefix
      // sums compose into the global order
      val mm = hist.agg(min("v").as("vmin"), max("v").as("vmax"))
      val blocked = hist.crossJoin(broadcast(mm))
        .withColumn("blk", least(lit(nBlocks - 1), greatest(lit(0),
          floor((col("v") - col("vmin")) * nBlocks /
            greatest(col("vmax") - col("vmin"), lit(1e-12))).cast("int"))))
        .drop("vmin", "vmax")
      // per-(flag, block) subtotals → cumulative block offsets: the only
      // group-partitioned window runs over ≤ |flags|·nBlocks rows
      val wOff = Window.partitionBy("l_returnflag").orderBy("blk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val offs = blocked.groupBy(col("l_returnflag"), col("blk"))
        .agg(sum("cnt").as("bcnt"))
        .withColumn("off", sum("bcnt").over(wOff) - col("bcnt"))
      val totals = offs.groupBy("l_returnflag").agg(sum("bcnt").as("n"))
      // within-block cumulative counts, parallel across (flag, block)
      val wIn = Window.partitionBy("l_returnflag", "blk").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = blocked
        .join(broadcast(offs.select("l_returnflag", "blk", "off")),
          Seq("l_returnflag", "blk"))
        .join(broadcast(totals), Seq("l_returnflag"))
        .withColumn("cum", sum("cnt").over(wIn) + col("off"))
        .withColumn("prev", col("cum") - col("cnt"))
      def pct(p: Double) = {
        val rk = (col("n") - 1) * p
        val lo = floor(rk)
        val hi = ceil(rk)
        val frac = rk - lo
        val isLo = col("prev") <= lo && lo < col("cum")
        val isHi = col("prev") <= hi && hi < col("cum")
        round(sum(
          when(isLo, col("v") * (lit(1.0) - frac)).otherwise(0.0) +
            when(isHi, col("v") * frac).otherwise(0.0)), 6)
      }
      cum.groupBy("l_returnflag")
        .agg(
          pct(0.25).as("p25"), pct(0.5).as("median"),
          pct(0.75).as("p75"), pct(0.9).as("p90"),
          max(col("n")).as("cnt"))
        .orderSmall("l_returnflag")
    }),

    // semi-structured JSON column: path extraction + typed aggregation
    // (events.props carries JSON metadata — the filter/rollup shape an
    // LLM-data pipeline uses for document metadata). get_json_object is
    // codegen'd; extraction happens map-side before the grouped agg.
    "q18_json_extract" -> ((s, dir) => {
      val e = events(s, dir)
      val k = get_json_object(col("props"), "$.k").cast("int")
      e.groupBy("event_type")
        .agg(
          count(lit(1)).as("cnt"),
          sum(k).as("sum_k"),
          min(k).as("min_k"),
          max(k).as("max_k"))
        .orderSmall("event_type")
    }),

    // #17 window functions: partitioned row_number + running exact sum
    "q17_window" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      o.select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(28, 4)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("run_spend"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    }),

    // LATERAL correlated derived table — "top-2 suppliers per nation"
    // as the user writes it: the inner SELECT references the outer row
    // and carries its own ORDER BY ... LIMIT. Catalyst decorrelates
    // the per-row limit into a window rank over ONE scan of supplier
    // (DuckDB plans the same shape) — never a re-execution per outer
    // row. Same SQL string on both engines.
    "q46_lateral" -> ((s, dir) => {
      t(s, dir, "nation").createOrReplaceTempView("nation_v")
      t(s, dir, "supplier").createOrReplaceTempView("supplier_v")
      s.sql("""
        SELECT n.n_name, t.s_name, t.s_acctbal
        FROM nation_v n,
        LATERAL (SELECT s_name, s_acctbal FROM supplier_v s
                 WHERE s.s_nationkey = n.n_nationkey
                 ORDER BY s_acctbal DESC, s_suppkey ASC LIMIT 2) t
        ORDER BY n.n_name, t.s_acctbal DESC, t.s_name""")
    }))

  /** q57's shared shape in either decimal mode. Exact mode (the oracle
    * path): power sums over inputs quantized once to 4 dp — products of
    * DECIMAL(19,4) x DECIMAL(18,4) stay exact at scale 8 in both
    * engines' decimal rules (precision 19+18+1 = 38, the widest product
    * both keep exact), so the closed forms evaluate on engine-identical
    * doubles. Production mode (`q57_fast_double`, bench-only — the h01
    * dual-mode pattern): the same ONE-aggregate plan with plain double
    * power sums, which stay inside whole-stage codegen's primitive fast
    * path; FastMathSpec bounds the drift vs exact. */
  private[graft] def corrOls(s: SparkSession, dir: String,
      exactDecimal: Boolean): DataFrame = {
    // (19,4) x (18,4): precision 19+18+1 = 38 exactly — the widest
    // product BOTH engines keep exact at scale 8 (Spark would round
    // a 39-precision result to scale 7; DuckDB needs one int128-wide
    // operand to avoid its int64 multiply overflow)
    val d19 = DecimalType(19, 4)
    val d18 = DecimalType(18, 4)
    // exact mode: three DECIMAL(38)-product updates per row dominate a
    // serial scan stage — the h01 shape, so the same adaptive fan-out
    // (ABBA-interleaved A/B at sf0.1: 1.18 -> 0.82 s min, fan faster in
    // all 6 pairs; plans/r17/fan_ab.txt). Production double sums are
    // lighter than the round-robin shuffle they'd buy — kept serial.
    val l0 = t(s, dir, "lineitem")
    val l = if (exactDecimal) fanScan(l0) else l0
    val g =
      if (exactDecimal)
        l.groupBy(col("l_returnflag")).agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast(d18)).as("sx"),
          sum(col("l_extendedprice").cast(d18)).as("sy"),
          sum(col("l_quantity").cast(d19) * col("l_extendedprice").cast(d18)).as("sxy"),
          sum(col("l_quantity").cast(d19) * col("l_quantity").cast(d18)).as("sxx"),
          sum(col("l_extendedprice").cast(d19) * col("l_extendedprice").cast(d18)).as("syy"))
      else
        l.groupBy(col("l_returnflag")).agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity")).as("sx"),
          sum(col("l_extendedprice")).as("sy"),
          sum(col("l_quantity") * col("l_extendedprice")).as("sxy"),
          sum(col("l_quantity") * col("l_quantity")).as("sxx"),
          sum(col("l_extendedprice") * col("l_extendedprice")).as("syy"))
    val (n, sx, sy, sxy, sxx, syy) = (col("n").cast("double"),
      col("sx").cast("double"), col("sy").cast("double"),
      col("sxy").cast("double"), col("sxx").cast("double"), col("syy").cast("double"))
    val cov = n * sxy - sx * sy
    val vx = n * sxx - sx * sx
    val vy = n * syy - sy * sy
    val slope = cov / vx
    g.select(col("l_returnflag"), col("n"),
      round(cov / (sqrt(vx) * sqrt(vy)), 6).as("pearson_r"),
      round(slope, 6).as("slope"),
      round((sy - slope * sx) / n, 6).as("intercept"))
      .orderSmall("l_returnflag")
  }

  /** Bench hook: q57 in production (double-sum) mode. */
  def corrOlsFast(s: SparkSession, dir: String): DataFrame =
    corrOls(s, dir, exactDecimal = false)

  val oracles: Map[String, String] = Map(
    // error-bounded sketch oracles: the Spark side computes the approx
    // sketch AND the exact value and ships a within-tolerance verdict;
    // DuckDB reproduces the exact columns and asserts the verdicts TRUE.
    // events.ts physical type is fixture-vintage-dependent (plain
    // micros currently; TIMESTAMP(NANOS)/nanos-as-long historically) —
    // Ops.normalizeEventTs adapts on read, and it's irrelevant here
    // anyway (no time column in the output).
    "q19_sketches" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
        |  COUNT(*) AS cnt, TRUE AS users_ok, TRUE AS median_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q42_sketch_union" ->
      """SELECT COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events,
        |  TRUE AS union_ok
        |FROM events""".stripMargin,

    // q54: the GK rank guarantee is what Spark must prove; the oracle
    // carries the exact row count plus literal-TRUE verdicts
    "q54_quantile_sketch" ->
      """SELECT COUNT(*) AS n, 1 AS ok_p25, 1 AS ok_p50, 1 AS ok_p75,
        |  1 AS ok_p95 FROM lineitem""".stripMargin,

    // q56: identical marginal/expectation arithmetic on the cell table
    "q56_chi2" ->
      """WITH cells AS (SELECT o_orderpriority AS p, o_orderstatus AS st,
        |    COUNT(*) AS o FROM orders GROUP BY 1, 2),
        |t AS (SELECT o,
        |    SUM(o) OVER (PARTITION BY p) AS rp,
        |    SUM(o) OVER (PARTITION BY st) AS cs,
        |    SUM(o) OVER () AS n FROM cells),
        |terms AS (SELECT o, n,
        |    CAST(rp AS DOUBLE) * CAST(cs AS DOUBLE) / CAST(n AS DOUBLE) AS e
        |  FROM t),
        |agg AS (SELECT CAST(MAX(n) AS BIGINT) AS n,
        |    CAST(SUM(CAST(round((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e, 6)
        |      AS DECIMAL(28,6))) AS DOUBLE) AS chi2
        |  FROM terms),
        |dims AS (SELECT COUNT(DISTINCT o_orderpriority) AS r,
        |    COUNT(DISTINCT o_orderstatus) AS c FROM orders)
        |SELECT n, chi2, CAST((r - 1) * (c - 1) AS INT) AS df,
        |  CAST(chi2 > 15.507 AS INT) AS significant
        |FROM agg CROSS JOIN dims""".stripMargin,

    // q57: identical decimal power sums (DECIMAL(18,4) products stay
    // exact at scale 8 under both engines' rules) and closed forms
    "q57_corr_ols" ->
      """WITH g AS (SELECT l_returnflag, COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS sy,
        |    SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(18,4))) AS sxy,
        |    SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS sxx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(18,4))) AS syy
        |  FROM lineitem GROUP BY l_returnflag),
        |d AS (SELECT l_returnflag, n,
        |    CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
        |    CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
        |    CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd
        |  FROM g)
        |SELECT l_returnflag, n,
        |  round((nd * sxyd - sxd * syd) /
        |    (sqrt(nd * sxxd - sxd * sxd) * sqrt(nd * syyd - syd * syd)), 6) AS pearson_r,
        |  round((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd), 6) AS slope,
        |  round((syd - (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) * sxd) / nd, 6)
        |    AS intercept
        |FROM d ORDER BY l_returnflag""".stripMargin,

    // q01/q02/q23 oracles carry NO ORDER BY, matching the unsorted
    // Spark side (round-14 map-only sort drop): the driver compare and
    // selfcheck both canonicalize by sorting rows, and the oracle is
    // also the TIMED baseline text — a sorted oracle against an
    // unsorted Spark plan would skew the cross-engine ratio.
    "q01_scan_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) AS revenue,
        |  l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge
        |FROM lineitem""".stripMargin,

    "q02_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount > 0.03 AND (l_returnflag = 'R' OR l_quantity < 10)""".stripMargin,

    "q03_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${sqlDavg("l_quantity")} AS avg_qty,
         |  ${sqlDavg("l_extendedprice")} AS avg_price,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q04_count_distinct" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS uniq_cust, COUNT(*) AS cnt
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q05_join_inner" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' ORDER BY o_orderkey""".stripMargin,

    "q06a_join_left" ->
      """SELECT n_name, COUNT(s_suppkey) AS supp_cnt
        |FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q06b_join_right" ->
      """SELECT n_name, COUNT(s_suppkey) AS supp_cnt
        |FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q06c_join_full" ->
      """WITH f AS (SELECT o_custkey AS fk, COUNT(*) AS cnt_f FROM orders
        |           WHERE o_orderstatus = 'F' GROUP BY o_custkey),
        |     p AS (SELECT o_custkey AS ok, COUNT(*) AS cnt_o FROM orders
        |           WHERE o_orderstatus = 'O' GROUP BY o_custkey)
        |SELECT COALESCE(fk, ok) AS custkey,
        |       COALESCE(cnt_f, 0) AS cnt_f, COALESCE(cnt_o, 0) AS cnt_o
        |FROM f FULL JOIN p ON fk = ok ORDER BY custkey""".stripMargin,

    "q07_multijoin" ->
      s"""SELECT n_name,
         |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q08_join_sortmerge" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'MACHINERY' ORDER BY o_orderkey""".stripMargin,

    "q09_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "q10_having" ->
      s"""SELECT p_brand, COUNT(*) AS cnt, ${sqlDsum("p_retailprice")} AS sum_price
         |FROM part GROUP BY p_brand HAVING COUNT(*) > 7 ORDER BY p_brand""".stripMargin,

    "q11_date_part" ->
      s"""SELECT CAST(date_part('year', ts) AS INTEGER) AS y,
         |  CAST(date_part('month', ts) AS INTEGER) AS m,
         |  CAST(date_part('day', ts) AS INTEGER) AS d,
         |  event_type, COUNT(*) AS cnt, ${sqlDsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2, 3, 4 ORDER BY y, m, d, event_type""".stripMargin,

    "q12_global_agg" ->
      s"""SELECT COUNT(*) AS cnt, ${sqlDsum("l_extendedprice")} AS sum_price,
         |  MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
         |  ${sqlDavg("l_discount")} AS avg_disc
         |FROM lineitem""".stripMargin,

    "q13_subquery" ->
      s"""SELECT p_brand, COUNT(*) AS n_above
         |FROM part p JOIN (SELECT p_brand AS b, ${sqlDavg("p_retailprice")} AS avg_price
         |                  FROM part GROUP BY p_brand) a ON p.p_brand = a.b
         |WHERE p.p_retailprice > a.avg_price
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q14_sql_api" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q22_semi_anti" ->
      """WITH f AS (SELECT * FROM orders WHERE o_orderstatus = 'F'),
        |tagged AS (
        |  SELECT c_mktsegment, 'has_f' AS side FROM customer c
        |  WHERE EXISTS (SELECT 1 FROM f WHERE f.o_custkey = c.c_custkey)
        |  UNION ALL
        |  SELECT c_mktsegment, 'no_f' AS side FROM customer c
        |  WHERE NOT EXISTS (SELECT 1 FROM f WHERE f.o_custkey = c.c_custkey))
        |SELECT side, c_mktsegment, COUNT(*) AS cnt
        |FROM tagged GROUP BY side, c_mktsegment ORDER BY side, c_mktsegment""".stripMargin,

    // No ORDER BY — matches the unsorted map-only Spark side (q01's note).
    "q23_strfuncs" ->
      """SELECT c_custkey,
        |  upper(substring(c_name, 1, 8)) AS prefix,
        |  concat(c_mktsegment, '/', c_name) AS tagged,
        |  length(c_name) AS name_len
        |FROM customer WHERE c_name LIKE '%1%'""".stripMargin,

    "q20_rollup" ->
      s"""SELECT CAST(GROUPING(l_returnflag) AS INTEGER) AS gflag,
         |  CAST(GROUPING(l_linestatus) AS INTEGER) AS gstatus,
         |  CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS flag,
         |  CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS status,
         |  ${sqlDsum("l_quantity")} AS sum_qty, COUNT(*) AS cnt
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY gflag, gstatus, flag, status""".stripMargin,

    "q21_setops" ->
      """WITH f AS (SELECT c_custkey, c_mktsegment FROM orders JOIN customer
        |           ON o_custkey = c_custkey WHERE o_orderstatus = 'F'),
        |     o AS (SELECT c_custkey, c_mktsegment FROM orders JOIN customer
        |           ON o_custkey = c_custkey WHERE o_orderstatus = 'O'),
        |     tagged AS (
        |       SELECT *, 'both' AS side FROM (SELECT * FROM f INTERSECT SELECT * FROM o)
        |       UNION ALL
        |       SELECT *, 'only_f' AS side FROM (SELECT * FROM f EXCEPT SELECT * FROM o))
        |SELECT side, c_mktsegment, COUNT(*) AS cnt
        |FROM tagged GROUP BY side, c_mktsegment ORDER BY side, c_mktsegment""".stripMargin,

    "q34_window_suite" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) OVER f AS DOUBLE)
        |    / COUNT(*) OVER f AS avg3
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  f AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q40_bag_setops" ->
      """WITH f AS (SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'),
        |     o2 AS (SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'),
        |     tagged AS (
        |       SELECT o_orderpriority, 'both' AS side
        |       FROM (SELECT * FROM f INTERSECT ALL SELECT * FROM o2)
        |       UNION ALL
        |       SELECT o_orderpriority, 'only_f' AS side
        |       FROM (SELECT * FROM f EXCEPT ALL SELECT * FROM o2))
        |SELECT side, o_orderpriority, COUNT(*) AS cnt
        |FROM tagged GROUP BY side, o_orderpriority
        |ORDER BY side, o_orderpriority""".stripMargin,

    "q41_pagination" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 20 OFFSET 100""".stripMargin,

    "q39_multi_distinct" ->
      s"""SELECT l_returnflag,
         |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
         |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
         |  COUNT(*) AS n_rows, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q37_null_ordering" ->
      """SELECT c_custkey, MAX(o_totalprice) AS max_price
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY max_price ASC NULLS FIRST, c_custkey ASC
        |LIMIT 50""".stripMargin,

    "q35_corr_subquery" ->
      """SELECT c_custkey, c_mktsegment,
        |  (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM customer c ORDER BY c_custkey""".stripMargin,

    "q29_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5), 6) AS median,
        |  round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
        |  round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
        |  COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q18_json_extract" ->
      """SELECT event_type, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q17_window" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |QUALIFY rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q46_lateral" ->
      """SELECT n.n_name, t.s_name, t.s_acctbal
        |FROM nation n,
        |LATERAL (SELECT s_name, s_acctbal FROM supplier s
        |         WHERE s.s_nationkey = n.n_nationkey
        |         ORDER BY s_acctbal DESC, s_suppkey ASC LIMIT 2) t
        |ORDER BY n.n_name, t.s_acctbal DESC, t.s_name""".stripMargin)
}
