package graft.queries

/** TPC-H-style SQL suite (round-3 verdict item 7): the standard
  * workload's plan shapes — deep multi-joins, EXISTS / NOT EXISTS,
  * correlated scalar subqueries, IN over grouped HAVING, CASE
  * aggregation, CTE + scalar-max subquery — expressed as plain SQL
  * strings over the TPC-H-ish corpus and run through Catalyst via
  * [[graft.GraftEngine.sql]]. The SAME string is the DuckDB oracle, so
  * the two engines must agree value-for-value.
  *
  * Adaptations to the trimmed test schema (no partsupp parquet, no
  * l_commitdate / l_receiptdate / l_shipmode, no o_shippriority /
  * o_comment, no c_phone / c_address), noted per query:
  *  - partsupp is DERIVED deterministically from part × supplier by
  *    [[PartsuppCte]] (the generator ships no partsupp file, and the
  *    testdata dir is read-only): 4 suppliers per part via a stride of
  *    suppliers/4 over the contiguous 0-based supplier keys, with
  *    availqty/supplycost as pure integer arithmetic of the two keys —
  *    the same CTE text evaluates identically in Spark and DuckDB, so
  *    h02/h09/h11/h16/h20 run their standard partsupp shapes with a
  *    full value oracle.
  *  - h04/h21 use shipped-after-order-date as the lateness predicate
  *    (l_commitdate / l_receiptdate are absent).
  *  - h02 outputs p_brand for p_mfgr and drops s_address/s_phone/
  *    s_comment (absent columns); h12 classifies by o_orderpriority
  *    (no l_shipmode); h13 filters URGENT priority (no o_comment);
  *    h16 keeps the brand/type/size predicates but has no s_comment
  *    complaint-supplier exclusion; h17 buckets by p_brand (no
  *    p_container); h20 outputs s_acctbal for s_address and widens
  *    the nation filter to 4 nations (the sparse random
  *    lineitem↔partsupp alignment would leave 1-2 rows otherwise);
  *    h22 derives the "country code" from c_custkey and anti-joins on
  *    URGENT orders (no c_phone; every customer here has orders).
  *
  * Double aggregates use the exact-decimal-sum pattern (Ops.sqlDsum) so
  * results are order-independent and engine-identical; LIMIT queries
  * carry a unique ORDER BY tiebreak.
  */
object TpchQueries {

  /** Deterministic partsupp derivation (the testdata generator ships no
    * partsupp parquet; /root/testdata is read-only). Referential by
    * construction: supplier keys are contiguous 0-based, so
    * `(p_partkey*13 + i*(s_cnt/4)) % s_cnt` yields 4 DISTINCT valid
    * suppliers per part at every scale factor (stride s_cnt/4 ≥ 1 for
    * s_cnt ≥ 8; i in 0..3 never wraps onto itself). availqty
    * (1..9999) and supplycost (1.00..999.99, exact cents / 100.0) are
    * pure integer arithmetic of the two keys — both engines compute
    * bit-identical values, so every aggregate over them value-oracles.
    * Scale shape: 4 rows per part (SF × 800k at true TPC-H), built by
    * a map-side cross join with two one-row/4-row broadcast frames —
    * no shuffle, no materialization.
    *
    * Reference anchor: the SQL-first surface of lib.rs execute_query —
    * a user's first workload is the standard TPC-H 22, and h02/h09/
    * h11/h16/h20 need supply-cost data. */
  val PartsuppCte: String =
    """WITH sup AS (SELECT CAST(COUNT(*) AS BIGINT) AS s_cnt FROM supplier),
      |gen AS (SELECT 0 AS i UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3),
      |partsupp AS (
      |  SELECT ps_partkey, ps_suppkey,
      |    (ps_partkey * 37 + ps_suppkey * 11) % 9999 + 1 AS ps_availqty,
      |    CAST((ps_partkey * 53 + ps_suppkey * 19) % 99900 + 100 AS DOUBLE) / 100 AS ps_supplycost
      |  FROM (SELECT p_partkey AS ps_partkey,
      |      (p_partkey * 13 + i * CAST(FLOOR(s_cnt / 4) AS BIGINT)) % s_cnt AS ps_suppkey
      |    FROM part CROSS JOIN gen CROSS JOIN sup) keys)""".stripMargin

  /** Shared ANSI SQL — one string per query, runnable verbatim by BOTH
    * Spark (defs below) and DuckDB (the oracle side). */
  val sql: Map[String, String] = Map(
    // sum_charge multiplies exact DECIMAL factors instead of casting the
    // double triple-product: price*(1-disc)*(1+tax) has 6 true decimal
    // digits, so rounding the double to 4 decimals lands on .xx50 ties
    // whose direction differs between Spark (exact BigDecimal expansion)
    // and DuckDB (FP-scaled round) — ~700 one-ulp row diffs at sf0.1.
    // Two-factor products (4 true decimals) never hit a tie and stay on
    // the cheaper cast-the-product form.
    "h01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(8,4)) * CAST(1 + l_tax AS DECIMAL(8,4))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // min-cost-supplier: correlated scalar MIN over the same 4-table
    // join as the outer query — the classic decorrelation shape.
    // ORDER BY is unique ((p_partkey, s_name) is a key of the output)
    "h02_min_cost_supplier" ->
      s"""$PartsuppCte
         |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
         |FROM part
         |  JOIN partsupp ON p_partkey = ps_partkey
         |  JOIN supplier ON s_suppkey = ps_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE' AND r_name = 'EUROPE'
         |  AND ps_supplycost = (SELECT MIN(ps2.ps_supplycost)
         |    FROM partsupp ps2 JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
         |      JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
         |      JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
         |    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,

    "h03_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue, o_orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin,

    // Q4 decorrelated (round 16): EXISTS as a DISTINCT inner join —
    // identical result set, measured neutral for the DuckDB oracle
    // (1.15 -> 1.19 s at sf10) and 2.2x for Spark (5.6 -> 2.6 s): a
    // LeftSemi join can only broadcast-build its RIGHT side, so the
    // EXISTS form forced the 60M-row lineitem shuffle+sort into a
    // SortMergeJoin; the inner form lets the planner broadcast the
    // filtered quarter of orders. Since round 17 that broadcast is
    // planned UP FRONT rather than AQE-rescued: o_orderdate reads as
    // plain TIMESTAMP (inferTimestampNTZ=false, GraftEngine.session)
    // and carries catalog min/max, so FilterEstimation prices the
    // quarter at ~4% of orders (562k rows at sf10) and the initial
    // plan never shuffles lineitem — measured 3.0 -> 1.4 s at sf10.
    // At 100 TB the quarter outgrows the broadcast threshold and the
    // same text degrades to the shuffle join.
    "h04_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM (SELECT DISTINCT o_orderkey, o_orderpriority
        |  FROM orders JOIN lineitem
        |    ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00') waiting
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "h05_local_supplier" ->
      """SELECT n_name, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "h06_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "h07_volume_shipping" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(SUM(CAST(volume AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    extract(year FROM l_shipdate) AS l_year, l_extendedprice * (1 - l_discount) AS volume
        |  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        |    JOIN orders ON o_orderkey = l_orderkey
        |    JOIN customer ON c_custkey = o_custkey
        |    JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |    JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "h08_market_share" ->
      """SELECT o_year,
        |  round(CAST(SUM(CAST(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END AS DECIMAL(28,4))) AS DOUBLE)
        |    / CAST(SUM(CAST(volume AS DECIMAL(28,4))) AS DOUBLE), 6) AS mkt_share
        |FROM (SELECT extract(year FROM o_orderdate) AS o_year, l_extendedprice * (1 - l_discount) AS volume,
        |    n2.n_name AS nation
        |  FROM part JOIN lineitem ON p_partkey = l_partkey
        |    JOIN supplier ON s_suppkey = l_suppkey
        |    JOIN orders ON l_orderkey = o_orderkey
        |    JOIN customer ON o_custkey = c_custkey
        |    JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |    JOIN region ON n1.n_regionkey = r_regionkey
        |    JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY') all_nations
        |GROUP BY o_year ORDER BY o_year""".stripMargin,

    // standard h09 profit, ps_supplycost term restored via the derived
    // partsupp: amount = 4-true-decimal price term minus 2-true-decimal
    // cost term, so the DECIMAL(28,4) cast never lands on a rounding tie
    "h09_product_profit" ->
      s"""$PartsuppCte
         |SELECT nation, o_year, CAST(SUM(CAST(amount AS DECIMAL(28,4))) AS DOUBLE) AS sum_profit
         |FROM (SELECT n_name AS nation, extract(year FROM o_orderdate) AS o_year,
         |    l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity AS amount
         |  FROM part JOIN lineitem ON p_partkey = l_partkey
         |    JOIN supplier ON s_suppkey = l_suppkey
         |    JOIN partsupp ON ps_suppkey = l_suppkey AND ps_partkey = l_partkey
         |    JOIN orders ON o_orderkey = l_orderkey
         |    JOIN nation ON s_nationkey = n_nationkey
         |  WHERE p_name LIKE '%red%') profit
         |GROUP BY nation, o_year ORDER BY nation, o_year DESC""".stripMargin,

    // value-concentration: grouped decimal sums vs a scalar-subquery
    // threshold over the same join (uncorrelated HAVING subquery)
    "h11_important_stock" ->
      s"""$PartsuppCte
         |SELECT ps_partkey, CAST(SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(28,4))) AS DOUBLE) AS value
         |FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |WHERE n_name = 'NATION_7'
         |GROUP BY ps_partkey
         |HAVING SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(28,4))) >
         |  (SELECT SUM(CAST(ps2.ps_supplycost * ps2.ps_availqty AS DECIMAL(28,4))) * 0.001
         |   FROM partsupp ps2 JOIN supplier s2 ON ps2.ps_suppkey = s2.s_suppkey
         |     JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
         |   WHERE n2.n_name = 'NATION_7')
         |ORDER BY value DESC, ps_partkey""".stripMargin,

    "h10_returned_items" ->
      """SELECT c_custkey, c_name, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
        |  c_acctbal, n_name
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    // the CASTs are type discipline, not arithmetic: Spark's SUM(int)
    // yields BIGINT but DuckDB's yields HUGEINT, and the driver's value
    // hash sees different representations (the round-4 verdict's one
    // red row) — pin both engines to BIGINT explicitly
    "h12_priority_lines" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "h13_customer_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) c_orders
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "h14_promo_effect" ->
      """SELECT round(100.00 *
        |  CAST(SUM(CAST(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(28,4))) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE), 6) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin,

    "h15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    // standard h16 over the derived partsupp (supplier_cnt counts
    // supply relationships, not lineitem incidence); no s_comment
    // complaint-supplier exclusion (column absent)
    "h16_parts_suppliers" ->
      s"""$PartsuppCte
         |SELECT p_brand, p_type, p_size,
         |  COUNT(DISTINCT ps_suppkey) AS supplier_cnt
         |FROM partsupp JOIN part ON p_partkey = ps_partkey
         |WHERE p_brand <> 'Brand#1' AND p_type <> 'MEDIUM'
         |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
         |GROUP BY p_brand, p_type, p_size
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "h17_small_qty_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#3'
        |  AND l_quantity < (SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*))
        |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin,

    // Q18 single-agg (round 16): the IN-subquery form aggregated
    // lineitem by l_orderkey TWICE (once for HAVING, once for the
    // outer sum over identical groups — the outer GROUP BY keys are
    // functionally dependent on o_orderkey); this computes the per-
    // order sum ONCE and joins it out. Both engines gain (DuckDB
    // oracle 2.7 -> 1.1 s, Spark 9.8 -> ~4 s at sf10; results equal,
    // verified row-for-row). The quantity sum needs NO decimal
    // discipline: l_quantity is integer-valued (1..50, per-order sums
    // <= ~500 << 2^53), so every partial double sum is an exact
    // integer in ANY accumulation order in both engines — h18 is
    // therefore also out of decimalBound (its fast twin would be a
    // no-op duplicate).
    "h18_large_volume" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        |  o_totalprice, sum_qty
        |FROM (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(l_quantity) > 250) big_orders
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "h19_discounted_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    // excess-stock suppliers: correlated aggregate subquery (per
    // (part, supplier) lineitem quantity sum) nested INSIDE an IN
    // subquery — the deepest decorrelation in the suite. A pair with
    // no lineitem sales compares against NULL and drops, per standard
    // TPC-H semantics
    "h20_excess_stock" ->
      s"""$PartsuppCte
         |SELECT s_name, s_acctbal
         |FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11', 'NATION_19')
         |  AND s_suppkey IN (
         |    SELECT ps_suppkey FROM partsupp
         |    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
         |      AND ps_availqty > (SELECT 0.5 * SUM(l.l_quantity) FROM lineitem l
         |        WHERE l.l_partkey = ps_partkey AND l.l_suppkey = ps_suppkey))
         |ORDER BY s_name""".stripMargin,

    "h21_waiting_suppliers" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |  JOIN orders ON o_orderkey = l1.l_orderkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND n_name = 'NATION_4'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,

    "h22_global_sales" ->
      """SELECT cntrycode, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS totacctbal
        |FROM (SELECT CAST(c_custkey % 10 AS INTEGER) AS cntrycode, c_acctbal
        |  FROM customer
        |  WHERE c_custkey % 10 IN (1, 3, 5, 7, 9)
        |    AND c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*) FROM customer
        |      WHERE c_acctbal > 0.0 AND c_custkey % 10 IN (1, 3, 5, 7, 9))
        |    AND NOT EXISTS (SELECT 1 FROM orders
        |      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')) custsale
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin)

  // h01 is the one pure single-table aggregate of the suite, and its
  // exact-decimal update expressions dominate its runtime — the shape
  // the scoped scan fan-out exists for (GraftEngine.sqlFanned: measured
  // 2.07 -> 0.96 s at sf0.1; identical text, identical results — a
  // round-robin exchange only changes partitioning and every h01
  // aggregate is an exact decimal sum/count). Join-shaped queries keep
  // plain sql(): a blanket fan regressed all six measured (plans/r17).
  private val fannedFacts: Map[String, Seq[String]] =
    Map("h01_pricing_summary" -> Seq("lineitem"))

  val defs: Map[String, Q] = sql.map { case (name, q) =>
    name -> ((s: org.apache.spark.sql.SparkSession, dir: String) =>
      fannedFacts.get(name) match {
        case Some(tables) =>
          graft.GraftEngine.cachedForDir(s, dir).sqlFanned(q, tables)
        case None => graft.GraftEngine.cachedForDir(s, dir).sql(q)
      })
  }

  // NOTE on projected timestamp columns (h03/h18's o_orderdate): the
  // session reads the fixtures' naive timestamp[us] as UTC TIMESTAMP
  // (inferTimestampNTZ=false, GraftEngine.session — what gives date
  // columns catalog stats), and the verify dump writes TimestampType
  // as parquet INT96 (spark.sql.parquet.outputTimestampType default),
  // which the driver's pandas read renders NAIVE — byte-for-byte the
  // same strings DuckDB renders for the fixture's naive column. Shared
  // text therefore stays value- and render-identical on both sides.
  val oracles: Map[String, String] = sql

  // ---- production decimal mode (GraftConfig.exactDecimal = false) --------
  //
  // The exact-decimal sum discipline above exists for the ORACLE: DuckDB
  // and Spark must agree bit-for-bit, which double summation (order-
  // dependent) cannot guarantee. SURVEY §6 measures that discipline at
  // ~5× on money-summing queries — BigDecimal-backed agg buffers fall
  // out of whole-stage codegen's primitive fast path. Production
  // pipelines that tolerate last-ulp float divergence (every comparable
  // Spark deployment does) should run plain double sums. The rewrite is
  // mechanical because the exact-mode pattern is uniform by
  // construction: every money sum is written
  //   CAST(SUM(CAST(expr AS DECIMAL(p,s))) AS DOUBLE)   — or, for the
  // h01 sum_charge triple product,
  //   CAST(SUM(CAST(a AS DECIMAL) * CAST(b AS DECIMAL) * CAST(c AS DECIMAL)) AS DOUBLE)
  // FastMathSpec pins the rewrite: fast h01 parses, runs, and matches
  // exact h01 within 1e-9 relative on every measure.
  private val TripleProductSum =
    ("""CAST\(SUM\(CAST\((.+?) AS DECIMAL\(\d+,\d+\)\) \* """ +
      """CAST\((.+?) AS DECIMAL\(\d+,\d+\)\) \* """ +
      """CAST\((.+?) AS DECIMAL\(\d+,\d+\)\)\) AS DOUBLE\)""").r
  private val DecimalSum =
    """CAST\(SUM\(CAST\((.+?) AS DECIMAL\(\d+,\d+\)\)\) AS DOUBLE\)""".r
  // HAVING-position sums (h11, h18) have no outer AS DOUBLE cast
  private val BareDecimalSum =
    """SUM\(CAST\((.+?) AS DECIMAL\(\d+,\d+\)\)\)""".r

  /** Rewrite one exact-decimal query to double-sum production form.
    * Triple-product first: its inner text contains ` AS DECIMAL`, which
    * would make the general pattern's non-greedy group mis-split; the
    * bare form last, since the wrapped form contains it. */
  def fastMoney(q: String): String = {
    val a = TripleProductSum.replaceAllIn(q, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"SUM((${m.group(1)}) * (${m.group(2)}) * (${m.group(3)}))"))
    val b = DecimalSum.replaceAllIn(a, m =>
      java.util.regex.Matcher.quoteReplacement(s"SUM(${m.group(1)})"))
    BareDecimalSum.replaceAllIn(b, m =>
      java.util.regex.Matcher.quoteReplacement(s"SUM(${m.group(1)})"))
  }

  /** The full h-suite in either decimal mode — `sqlFor(true)` is the
    * oracle-exact map above, `sqlFor(false)` the production rewrite. */
  def sqlFor(exactDecimal: Boolean): Map[String, String] =
    if (exactDecimal) sql else sql.map { case (k, v) => k -> fastMoney(v) }

  /** Bench hook: flagship pricing summary in production (double) mode.
    * Not part of the driver correctness contract — the bench times it
    * alongside exact h01 so the cost of oracle discipline is a
    * recorded number per round. */
  def pricingSummaryFast(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    graft.GraftEngine.cachedForDir(s, dir).sql(fastMoney(sql("h01_pricing_summary")))

  /** The h-queries whose runtime is most dominated by exact-decimal
    * money sums (lineitem-volume aggregates), benched in BOTH modes so
    * the production-vs-oracle-discipline ratio is a recorded number per
    * round, not a one-off footnote.
    *
    * Exactness caveat (round-7 advice): [[fastMoney]] rewrites EVERY
    * decimal sum, including sums feeding PREDICATES — h17's correlated
    * `0.2 * avg(l_quantity)` threshold becomes a double compare, so a
    * row whose quantity sits exactly on the threshold can flip in fast
    * mode, changing the result SET, not just output rounding.
    * Acceptable for a bench-only mode (FastMathSpec bounds the observed
    * drift at 1e-9 relative on the test corpora, which cannot prove the
    * knife-edge case away at scale); a production deployment that needs
    * exact predicate semantics keeps threshold-position sums decimal. */
  val decimalBound: Seq[String] = Seq(
    "h01_pricing_summary", "h08_market_share", "h09_product_profit",
    "h17_small_qty_revenue")

  /** Any h-query in production (double-sum) mode. */
  def fastQuery(name: String)(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    graft.GraftEngine.cachedForDir(s, dir).sql(fastMoney(sql(name)))
}
