package graft.queries

import org.apache.spark.sql.functions._
import graft.GraftEngine

/** SQL access to the pipeline operators (round-3 verdict item 4). The
  * reference engine is SQL-first (/root/reference/gpu-olap-core/src/
  * lib.rs execute_query); these queries prove graft's dedup/similarity
  * suite is reachable PURELY through `GraftEngine.sql` — the DataFrame
  * operators are registered as lazy temp views
  * ([[GraftEngine.registerPipelineViews]]) and everything below is one
  * SQL string composing them with ordinary relational SQL.
  *
  * The oracles wrap the operator family's existing generated oracle SQL
  * as a derived table, so both sides stay pinned to the same constants.
  */
object SqlSurfaceQueries {

  // One engine per (session, corpus dir), like a real SQL session:
  // table registration + view setup happen once, every subsequent
  // sql() call reuses them. Rebuilding the engine per query re-read
  // eleven parquet schemas each time — pure harness overhead that the
  // oracle side (one DuckDB process, views created once) never paid.
  // Registration is lazy (StorageLifecycleSpec pins zero jobs), so
  // caching holds no materialized state — only analyzed plans.
  private val registered =
    scala.collection.concurrent.TrieMap.empty[(org.apache.spark.sql.SparkSession, String), Boolean]

  private def engine(s: org.apache.spark.sql.SparkSession, dir: String): GraftEngine = {
    val e = GraftEngine.cachedForDir(s, dir)
    registered.getOrElseUpdate((s, dir), { e.registerPipelineViews(); true })
    // a harness hygiene sweep between queries may have dropped the
    // views' shared cache entries; restore them (lazy, no jobs)
    e.repinSharedCaches()
    e
  }

  val defs: Map[String, Q] = Map(
    // exact-dedup keep set joined back to the corpus — the "which docs
    // survive, what do they look like" query a curation user writes
    // first, in plain SQL over the operator view (the keep_id % 5
    // filter proves predicates prune THROUGH the view into the
    // operator's own plan; the base corpus has no exact duplicates, so
    // an n_copies filter would make the check vacuous)
    "x01_sql_dedup_keep" -> ((s, dir) => engine(s, dir).sql(
      """SELECT k.keep_id, k.n_copies, d.lang, length(d.text) AS n_chars
        |FROM graft_dedup_exact k JOIN documents d ON d.doc_id = k.keep_id
        |WHERE k.keep_id % 5 = 0
        |ORDER BY k.keep_id""".stripMargin)),

    // near-dup candidate DEGREE per doc from the MinHash-LSH pair view:
    // GROUP BY over a union of both pair directions, pure SQL.
    // registerBandIndexView repoints the view at candidates probed
    // from the committed band index first (the x04/x06 pattern)
    "x02_sql_dup_degree" -> ((s, dir) => {
      val e = engine(s, dir)
      e.registerBandIndexView()
      e.sql(
      """SELECT doc_id, COUNT(*) AS n_candidates FROM (
        |  SELECT doc_a AS doc_id FROM graft_minhash_pairs
        |  UNION ALL
        |  SELECT doc_b AS doc_id FROM graft_minhash_pairs)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    }),

    // similarity search from SQL: filter/reshape the brute-force top-k
    // view like any table (the WHERE prunes to the top-3 per query)
    "x03_sql_ann_topk" -> ((s, dir) => engine(s, dir).sql(
      """SELECT query_id, vec_id, cos, rank
        |FROM graft_topk_cosine
        |WHERE rank <= 3
        |ORDER BY query_id, rank""".stripMargin)),

    // span-level duplication report from SQL: the d10 substring-span
    // view joined back to the corpus for the worst verbatim overlaps —
    // the "show me what's actually copied" audit a curation user runs.
    // registerSpanIndexView repoints the view at the committed span
    // index first (built-or-reused, the x06 registerAnnView pattern),
    // so the query probes stored windows instead of re-deriving them
    "x04_sql_span_report" -> ((s, dir) => {
      val e = engine(s, dir)
      e.registerSpanIndexView()
      e.sql(
      """SELECT p.doc_a, p.doc_b, p.longest_span, p.shared_windows,
        |  a.lang AS lang_a, b.lang AS lang_b
        |FROM graft_substring_pairs p
        |JOIN documents a ON a.doc_id = p.doc_a
        |JOIN documents b ON b.doc_id = p.doc_b
        |WHERE p.longest_span >= 12
        |ORDER BY p.longest_span DESC, p.doc_a, p.doc_b""".stripMargin)
    }),

    // split audit from SQL: the deterministic train/val/test assignment
    // crossed with language — the mixture-per-split sanity report every
    // dataset release ships
    "x05_sql_split_report" -> ((s, dir) => engine(s, dir).sql(
      """SELECT split, lang, COUNT(*) AS n_docs
        |FROM graft_split GROUP BY split, lang
        |ORDER BY split, lang""".stripMargin)),

    // the DEFAULT ANN surface from SQL (round-4 verdict item 5):
    // graft_ann_topk is the k-means IVF path at DefaultAnnProbe probes
    // (recall floor pinned in AnnRecallSpec) — registerAnnView BUILDS
    // the index (training runs jobs), then plain SQL queries it
    "x06_sql_ann_default" -> ((s, dir) => {
      val e = engine(s, dir)
      e.registerAnnView()
      e.sql(
        """SELECT query_id, vec_id, cos, rank
          |FROM graft_ann_topk
          |WHERE rank <= 5
          |ORDER BY query_id, rank""".stripMargin)
    }),

    // MERGE from the SQL surface (round-5 lifecycle work): customer is
    // materialized as a manifest table, a deterministic updates batch
    // (10% balance-adjusted + a synthetic insert slice) is upserted
    // through the atomic snapshot commit, and the post-merge table is
    // queried with plain SQL — the write-side counterpart of x01-x06.
    // (customer, not orders: the demo pays two physical snapshot
    // writes that the in-SQL oracle never does, so the smallest table
    // with a categorical rollup key carries the same proof cheapest)
    "x07_sql_merge" -> ((s, dir) => {
      val e = engine(s, dir)
      mergedCustomerView(e, "graft_customer_merged")
      e.sql(
        """SELECT c_mktsegment, COUNT(*) AS n_customers,
          |  CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS total_bal
          |FROM graft_customer_merged
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    }),

    // time travel from SQL: the pre-merge snapshot (v0) registers as
    // its own view off the commit log, and one join classifies every
    // live row as inserted / updated / unchanged — the audit query a
    // data-release review runs against any mutated table
    "x08_sql_time_travel" -> ((s, dir) => {
      val e = engine(s, dir)
      mergedCustomerView(e, "graft_customer_tt")
      e.registerManifestVersion("graft_customer_tt", 0)
      e.sql(
        """SELECT CASE WHEN o.c_custkey IS NULL THEN 'inserted'
          |            WHEN n.c_acctbal <> o.c_acctbal THEN 'updated'
          |            ELSE 'unchanged' END AS change,
          |  COUNT(*) AS n_rows,
          |  CAST(SUM(CAST(n.c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS total_bal
          |FROM graft_customer_tt n
          |LEFT JOIN graft_customer_tt_v0 o ON o.c_custkey = n.c_custkey
          |GROUP BY 1 ORDER BY 1""".stripMargin)
    }),

    // per-source quality report over the Gopher-rule view: pass rates
    // and the failing-rule histogram — the curation dashboard query a
    // data engineer writes in plain SQL against the operator view
    "x09_sql_quality_report" -> ((s, dir) => engine(s, dir).sql(
      """SELECT d.source,
        |  COUNT(*) AS n_docs,
        |  SUM(CASE WHEN g.passes THEN 1 ELSE 0 END) AS n_pass,
        |  SUM(CASE WHEN NOT g.r_symbols THEN 1 ELSE 0 END) AS fail_symbols,
        |  SUM(CASE WHEN NOT g.r_alpha THEN 1 ELSE 0 END) AS fail_alpha,
        |  SUM(CASE WHEN NOT g.r_stopwords THEN 1 ELSE 0 END) AS fail_stopwords
        |FROM graft_gopher_rules g JOIN documents d ON d.doc_id = g.doc_id
        |GROUP BY d.source ORDER BY d.source""".stripMargin)),

    // x10 ANALYZE-style catalog statistics from SQL: per-column null
    // counts, exact distinct cardinality, min/max, and the q42-style
    // HLL verdict (approx_ok must be TRUE for the row to hash-match —
    // the oracle recomputes exact stats and asserts it). The underlying
    // production operator (Profile.profile) is one scan, one aggregate,
    // sketches instead of exact distincts.
    "x10_sql_profile" -> ((s, dir) => engine(s, dir).sql(
      """SELECT * FROM graft_profile_orders ORDER BY col_name""".stripMargin)),

    // x12: stored-SIGNATURE bucket audit from SQL. The simhash index
    // was the only stored index without a SQL surface (band/span/ANN
    // all repoint views): registerSimhashIndexView repoints
    // graft_simhash_pairs at the committed index and registers the raw
    // signature table as graft_simhash_sigs, and this audit groups
    // signatures by their prefix bucket and reports the occupied ones —
    // the bucket-skew probe a curation user runs BEFORE paying for the
    // corpus-wide pair scan. The DuckDB oracle re-derives signatures
    // from raw text (the d02/d03 stored-vs-fresh discipline).
    "x12_sql_simhash_buckets" -> ((s, dir) => {
      val e = engine(s, dir)
      e.registerSimhashIndexView()
      e.sql(
        s"""SELECT substring(simhash, 1, ${graft.operators.Dedup.SimhashPrefixBits}) AS prefix,
           |  COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
           |FROM graft_simhash_sigs
           |GROUP BY 1 HAVING COUNT(*) > 1
           |ORDER BY prefix""".stripMargin)
    }),

    // x11: dbt-style data-quality constraint audit in plain SQL —
    // PK uniqueness, referential integrity, NOT NULL, and
    // accepted-values. One check is DELIBERATELY violated on the
    // fixture (l_returnflag also carries 'R') so the audit provably
    // DETECTS — an all-zeros report can't tell working checks from
    // vacuous ones. The Spark side runs the FUSED form: all lineitem
    // checks ride ONE scan (the FK left join carries the qty and
    // returnflag CASE-counts through the same pass) and all orders
    // checks ride one aggregate, stack()ed into the verdict rows —
    // the oracle keeps the portable one-scan-per-check UNION ALL,
    // which at sf10 cost 10.2 s of separate full scans (round-13
    // verdict item 3). Row-identity of the two forms is spec-pinned
    // (SqlSurfaceSpec). */
    "x11_sql_constraints" -> ((s, dir) => engine(s, dir).sql(ConstraintAuditFusedSql)))

  /** x11's fused Spark-side audit: one pass over each table. CASE
    * count semantics match the oracle's WHERE branches exactly — a
    * NULL predicate (NULL returnflag/status, NULL l_orderkey in the
    * FK check) counts in neither form. The oracle's FK subquery
    * filters NULL o_orderkey explicitly: without it, a single NULL PK
    * would flip NOT IN to zero violations (three-valued logic) while
    * this left-join form still counts unmatched rows — the filter
    * makes the two forms equivalent unconditionally, not just on
    * NULL-free PK data. `stack` pivots the two one-row
    * aggregates into the verdict rows; the cross join is 1×1. */
  val ConstraintAuditFusedSql: String =
    """WITH li AS (
      |  SELECT
      |    count(CASE WHEN l.l_orderkey IS NOT NULL AND o.__ok IS NULL
      |               THEN 1 END) AS fk_orders,
      |    count(CASE WHEN l.l_quantity <= 0 THEN 1 END) AS qty_positive,
      |    count(CASE WHEN l.l_returnflag NOT IN ('A', 'N') THEN 1 END)
      |      AS returnflag_in
      |  FROM lineitem l
      |  LEFT JOIN (SELECT DISTINCT o_orderkey AS __ok FROM orders) o
      |    ON l.l_orderkey = o.__ok),
      |ord AS (
      |  SELECT
      |    count(CASE WHEN o_custkey IS NULL THEN 1 END) AS custkey_null,
      |    count(*) - count(DISTINCT o_orderkey) AS pk_unique,
      |    count(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 END)
      |      AS status_accepted
      |  FROM orders)
      |SELECT check_name, violations FROM (
      |  SELECT stack(6,
      |    'lineitem_fk_orders', fk_orders,
      |    'lineitem_qty_positive', qty_positive,
      |    'lineitem_returnflag_in_A_N', returnflag_in,
      |    'orders_custkey_not_null', custkey_null,
      |    'orders_pk_unique', pk_unique,
      |    'orders_status_accepted', status_accepted) AS (check_name, violations)
      |  FROM li CROSS JOIN ord)
      |ORDER BY check_name""".stripMargin

  /** x11's audit in the portable one-scan-per-check form — the DuckDB
    * oracle text, and the reference form the fused plan is spec-pinned
    * row-identical to. */
  val ConstraintAuditSql: String =
    """SELECT * FROM (
      |  SELECT 'lineitem_fk_orders' AS check_name, COUNT(*) AS violations
      |  FROM lineitem
      |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders
      |                           WHERE o_orderkey IS NOT NULL)
      |  UNION ALL
      |  SELECT 'lineitem_qty_positive', COUNT(*) FROM lineitem WHERE l_quantity <= 0
      |  UNION ALL
      |  SELECT 'lineitem_returnflag_in_A_N', COUNT(*)
      |  FROM lineitem WHERE l_returnflag NOT IN ('A', 'N')
      |  UNION ALL
      |  SELECT 'orders_custkey_not_null', COUNT(*) FROM orders WHERE o_custkey IS NULL
      |  UNION ALL
      |  SELECT 'orders_pk_unique', COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders
      |  UNION ALL
      |  SELECT 'orders_status_accepted', COUNT(*)
      |  FROM orders WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
      |ORDER BY check_name""".stripMargin

  /** x10's profiled columns: (name, numeric?). Timestamps profile as
    * strings (both engines render '1995-01-01 00:00:00'). */
  private val OrdersProfileCols = Seq(
    "o_orderkey" -> true, "o_custkey" -> true, "o_orderstatus" -> false,
    "o_totalprice" -> true, "o_orderdate" -> false, "o_orderpriority" -> false)

  // one temp root per (session, view), reused across invocations and
  // WIPED before each rebuild: a fresh createTempDirectory per call
  // accreted two customer snapshots of disk per bench/verify run,
  // forever (round-5 advice). Reuse keeps invocations independent —
  // the wipe means every build starts from an empty log — while
  // bounding disk at one copy per session.
  private val mergeRoots =
    scala.collection.concurrent.TrieMap.empty[(org.apache.spark.sql.SparkSession, String), String]

  private def wipe(dir: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
    }

  /** Shared x07/x08 setup: snapshot `customer` into a manifest table,
    * upsert the deterministic merge batch (keys %10==0 get a 1.1×
    * balance; keys %17==3 re-insert shifted by 1e7 into the 'MERGED'
    * segment), register the merged table as `view` (a 2-snapshot log
    * per build). */
  // private[graft] so MergeSplitProbe can time the WRITE phase apart
  // from the query phase (the PLANS.md x07/x08 exemption evidence).
  private[graft] def mergedCustomerView(e: GraftEngine, view: String): Unit = {
    val customer = e.table("customer")
    val root = mergeRoots.getOrElseUpdate((e.spark, view),
      java.nio.file.Files.createTempDirectory("graft_merge").toString)
    val path = s"$root/customer"
    wipe(java.nio.file.Paths.get(path))
    e.createManifestTable(view, path, customer)
    val updates = customer.filter(col("c_custkey") % 10 === 0)
      .withColumn("c_acctbal", col("c_acctbal") * lit(1.1))
    val inserts = customer.filter(col("c_custkey") % 17 === 3)
      .withColumn("c_custkey", col("c_custkey") + lit(10000000L))
      .withColumn("c_mktsegment", lit("MERGED"))
    e.upsertManifestTable(view, updates.unionByName(inserts), Seq("c_custkey"))
  }

  val oracles: Map[String, String] = Map(
    "x01_sql_dedup_keep" ->
      s"""SELECT k.keep_id, k.n_copies, d.lang, length(d.text) AS n_chars
         |FROM (${DedupQueries.oracles("d01_dedup_exact")}) k
         |JOIN documents d ON d.doc_id = k.keep_id
         |WHERE k.keep_id % 5 = 0
         |ORDER BY k.keep_id""".stripMargin,

    "x02_sql_dup_degree" ->
      s"""SELECT doc_id, COUNT(*) AS n_candidates FROM (
         |  SELECT doc_a AS doc_id FROM (${DedupQueries.oracles("d02_dedup_minhash")})
         |  UNION ALL
         |  SELECT doc_b AS doc_id FROM (${DedupQueries.oracles("d02_dedup_minhash")}))
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "x03_sql_ann_topk" ->
      s"""SELECT query_id, vec_id, cos, rank
         |FROM (${SimilarityQueries.oracles("s01_topk_cosine")})
         |WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    "x04_sql_span_report" ->
      s"""SELECT p.doc_a, p.doc_b, p.longest_span, p.shared_windows,
         |  a.lang AS lang_a, b.lang AS lang_b
         |FROM (${DedupQueries.oracles("d10_dedup_substring")}) p
         |JOIN documents a ON a.doc_id = p.doc_a
         |JOIN documents b ON b.doc_id = p.doc_b
         |WHERE p.longest_span >= 12
         |ORDER BY p.longest_span DESC, p.doc_a, p.doc_b""".stripMargin,

    // p03's hash thresholds (205=0xcd, 230=0xe6) crossed with language
    "x05_sql_split_report" ->
      s"""WITH assigned AS (
         |  SELECT lang,
         |    CASE WHEN substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
         |           THEN 'train'
         |         WHEN substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
         |           THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents)
         |SELECT split, lang, COUNT(*) AS n_docs
         |FROM assigned GROUP BY split, lang
         |ORDER BY split, lang""".stripMargin,

    "x06_sql_ann_default" ->
      s"""SELECT query_id, vec_id, cos, rank
         |FROM (${SimilarityQueries.kmeansSearchOracle(
               graft.operators.Similarity.DefaultAnnProbe)})
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    "x07_sql_merge" ->
      s"""WITH $mergedCustomerCtes
         |SELECT c_mktsegment, COUNT(*) AS n_customers,
         |  CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS total_bal
         |FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "x08_sql_time_travel" ->
      s"""WITH $mergedCustomerCtes
         |SELECT CASE WHEN o.c_custkey IS NULL THEN 'inserted'
         |            WHEN n.c_acctbal <> o.c_acctbal THEN 'updated'
         |            ELSE 'unchanged' END AS change,
         |  COUNT(*) AS n_rows,
         |  CAST(SUM(CAST(n.c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS total_bal
         |FROM merged n
         |LEFT JOIN customer o ON o.c_custkey = n.c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // x09: wraps t14's oracle verbatim as the rule source
    "x09_sql_quality_report" ->
      s"""SELECT d.source,
         |  COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN g.passes THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
         |  CAST(SUM(CASE WHEN NOT g.r_symbols THEN 1 ELSE 0 END) AS BIGINT)
         |    AS fail_symbols,
         |  CAST(SUM(CASE WHEN NOT g.r_alpha THEN 1 ELSE 0 END) AS BIGINT)
         |    AS fail_alpha,
         |  CAST(SUM(CASE WHEN NOT g.r_stopwords THEN 1 ELSE 0 END) AS BIGINT)
         |    AS fail_stopwords
         |FROM (${TextQueries.oracles("t14_gopher_rules")}) g
         |JOIN documents d ON d.doc_id = g.doc_id
         |GROUP BY d.source ORDER BY d.source""".stripMargin,

    // x10: the oracle computes the exact statistics per column and
    // asserts the sketch verdict literally TRUE — a Spark HLL estimate
    // outside the 5% bound flips approx_ok and hash-mismatches.
    "x10_sql_profile" -> (OrdersProfileCols.map { case (name, num) =>
      val minNum = if (num) s"round(CAST(MIN($name) AS DOUBLE), 4)" else "CAST(NULL AS DOUBLE)"
      val maxNum = if (num) s"round(CAST(MAX($name) AS DOUBLE), 4)" else "CAST(NULL AS DOUBLE)"
      val minS = if (num) "CAST(NULL AS VARCHAR)" else s"CAST(MIN($name) AS VARCHAR)"
      val maxS = if (num) "CAST(NULL AS VARCHAR)" else s"CAST(MAX($name) AS VARCHAR)"
      s"""SELECT '$name' AS col_name,
         |  COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($name) AS n_nulls,
         |  COUNT(DISTINCT $name) AS n_distinct,
         |  TRUE AS approx_ok,
         |  $minNum AS min_num, $maxNum AS max_num,
         |  $minS AS min_s, $maxS AS max_s
         |FROM orders""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")),

    // x11: the audit SQL is engine-portable — the oracle runs the
    // identical text (the 'R' returnflag violation count is real data,
    // so both engines must count it identically)
    "x11_sql_constraints" -> ConstraintAuditSql,

    "x12_sql_simhash_buckets" ->
      s"""SELECT substring(simhash, 1, ${graft.operators.Dedup.SimhashPrefixBits}) AS prefix,
         |  COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
         |FROM (${DedupQueries.simhashSigsSql})
         |GROUP BY 1 HAVING COUNT(*) > 1
         |ORDER BY prefix""".stripMargin)

  /** DuckDB twin of [[mergedCustomerView]]'s merge, as CTEs: the anti-
    * join + union IS the MERGE semantics, so the oracle states it
    * directly over the base table. */
  private def mergedCustomerCtes: String =
    """updates AS (
      |  SELECT c_custkey, c_name, c_nationkey,
      |    c_acctbal * 1.1 AS c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 10 = 0
      |  UNION ALL
      |  SELECT c_custkey + 10000000, c_name, c_nationkey,
      |    c_acctbal, 'MERGED'
      |  FROM customer WHERE c_custkey % 17 = 3),
      |merged AS (
      |  SELECT c.* FROM customer c
      |  WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
      |  UNION ALL SELECT * FROM updates)""".stripMargin
}
