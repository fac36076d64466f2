package graft

import graft.functions.TextFunctions
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Adversarial-input hardening: scalacheck-GENERATED corpora (fixed
  * seed, so failures reproduce) pushed through the text/dedup operators
  * as ordinary DataFrames — one Spark job per property over the whole
  * sample set, not one per sample.
  */
class EdgeCaseSpec extends SparkSpec {

  /** Deterministic sample of n values from a generator. */
  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val nastyText: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf(" ", "\t", "\n", "\u000B" /* vertical tab: in Java \s, NOT in RE2 \s */, "\f", "\r", "word", "123",
      "a@b.cd", "+1-555-0100", "<EMAIL>", "the", "%", "|", "'", "\\"))
      .map(_.mkString(" ")),
    Gen.const(""),
    Gen.const(" \t\n\u000B\f\r "))

  test("piiRedact is idempotent on adversarial strings") {
    import spark.implicits._
    val df = sample(nastyText, 300).toDF("text")
    val once = TextFunctions.piiRedact(col("text"))
    val twice = TextFunctions.piiRedact(once)
    assert(df.filter(not(twice <=> once)).count() == 0)
  }

  test("fingerprint is whitespace-normalization invariant on generated text") {
    import spark.implicits._
    val texts = sample(Gen.asciiPrintableStr, 200)
    // the same text with extra whitespace wrapping/padding must collide
    val df = texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, s"  ${t.replace(" ", "\t ")} \n")
    }.toDF("id", "a", "b")
    val diff = df.filter(
      TextFunctions.fingerprint(col("a")) =!= TextFunctions.fingerprint(col("b"))).count()
    assert(diff == 0)
  }

  test("token counts are non-negative and bpe >= ws on adversarial strings") {
    import spark.implicits._
    val df = sample(nastyText, 300).toDF("text")
    val bad = df.select(
      TextFunctions.wsTokenCount(col("text")).as("ws"),
      TextFunctions.bpeTokenCount(col("text")).as("bpe"))
      .filter(col("ws") < 0 || col("bpe") < col("ws")).count()
    assert(bad == 0)
  }

  test("simhash hamming distance is symmetric and bounded on generated docs") {
    import spark.implicits._
    val docs = sample(nastyText.suchThat(_.trim.nonEmpty), 60)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val s = Dedup.simhashed(docs)
    val pairs = s.as("l").crossJoin(s.as("r"))
      .select(
        Dedup.hamming(col("l.simhash"), col("r.simhash")).as("h_lr"),
        Dedup.hamming(col("r.simhash"), col("l.simhash")).as("h_rl"))
    assert(pairs.filter(col("h_lr") =!= col("h_rl")).count() == 0)
    assert(pairs.filter(col("h_lr") < 0 || col("h_lr") > 64).count() == 0)
  }

  test("empty inputs flow through the operator families without errors") {
    import spark.implicits._
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Dedup.exact(noDocs).count() == 0)
    assert(Dedup.minhashCandidates(noDocs).count() == 0)
    assert(Dedup.simhashPairs(noDocs).count() == 0)
    assert(Dedup.jaccardPairs(noDocs).count() == 0)
    assert(Dedup.clusters(noDocs).count() == 0)
    assert(Dedup.decontaminate(noDocs, noDocs).count() == 0)
    assert(Dedup.embeddingCosinePairs(noVecs).count() == 0)
    val q = Similarity.defaultQueries(noVecs)
    assert(Similarity.bruteForceTopK(noVecs, q).count() == 0)
    assert(Similarity.annTopK(noVecs, q).count() == 0)
    assert(Similarity.ivfTopK(noVecs, q).count() == 0)
    assert(Dedup.cdcChunkDups(noDocs).count() == 0)
    // round-8 continuation families
    val noEvents = Seq.empty[(Long, java.sql.Timestamp, String, Long)]
      .toDF("user_id", "ts", "event_type", "event_id")
    val funnel = operators.EventAnalytics.funnel(noEvents,
      Seq("view", "click", "purchase"),
      col("user_id"), col("ts"), col("event_type")).collect()
    assert(funnel.length == 3 && funnel.forall(_.getLong(1) == 0),
      "empty log must still report every stage at zero")
    assert(operators.EventAnalytics.retention(noEvents,
      col("user_id"), col("ts")).count() == 0)
    assert(operators.EventAnalytics.transitions(noEvents,
      col("user_id"), col("ts"), col("event_type"), col("event_id")).count() == 0)
    val noDirty = Seq.empty[(Long, String)].toDF("id", "dname")
    val res = operators.Resolve.resolve(noDirty,
      Seq("red widget").toDF("name"), "id", "dname", "name")
    assert(res.count() == 0)
    val prof = operators.Profile.profile(noDocs, exactCheck = true).collect()
    assert(prof.length == 2, "one profile row per column, even when empty")
    assert(prof.forall(r => r.getLong(1) == 0 && r.getBoolean(4)),
      "empty table: zero rows and a vacuously green sketch verdict")
  }

  test("CDC chunking degenerate docs: single word, all-cut words, duplicate docs") {
    import spark.implicits._
    // "hash" is a cut word at CdcDivisor=8 on this vocab (spec'd in
    // DedupSpec); a doc of ONLY cut words chunks to singletons, which
    // the min-width filter drops from the dup report but which must
    // still reconstruct the doc in the chunk stage
    val docs = Seq(
      (1L, "solo"),
      (2L, "hash hash hash"),
      (3L, "copy of a shared span here"),
      (4L, "copy of a shared span here")).toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(docs).collect()
    assert(chunks.count(_.getLong(0) == 1L) == 1, "single word = one chunk")
    assert(chunks.filter(_.getLong(0) == 2L).sortBy(_.getInt(1))
      .map(_.getString(2)).toSeq ==
      Seq("hash", "hash", "hash"), "all-cut doc chunks to singletons")
    val dups = Dedup.cdcChunkDups(docs).collect()
    assert(dups.nonEmpty && dups.forall(_.getAs[Long]("n_docs") == 2),
      "exact-duplicate docs must share every min-width chunk")
  }

  test("resolveComponents converges on a path graph with diameter far above maxIters") {
    import spark.implicits._
    // a 120-vertex chain: diameter 119 >> maxIters=5, so plain
    // propagation cannot finish — the doubling fallback must kick in
    // (O(log d) rounds) and still produce exact component minima
    val n = 120
    val vertices = (0L until n.toLong).toDF("doc_id")
    val pathEdges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // second component: an isolated pair, to prove labels don't bleed
    val vertices2 = vertices.union(Seq(1000L, 1001L).toDF("doc_id"))
    val edges2 = pathEdges.union(Seq((1000L, 1001L)).toDF("doc_a", "doc_b"))
    val labels = Dedup.resolveComponents(vertices2, edges2, maxIters = 5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_rep")).toMap
    assert(labels.size == n + 2)
    (0L until n.toLong).foreach(v => assert(labels(v) == 0L, s"vertex $v"))
    assert(labels(1000L) == 1000L && labels(1001L) == 1000L)
  }

  test("single-document corpus: no self-pairs, cluster keeps itself") {
    import spark.implicits._
    val one = Seq((42L, "only one document here")).toDF("doc_id", "text")
    assert(Dedup.minhashCandidates(one).count() == 0)
    assert(Dedup.simhashPairs(one).count() == 0)
    val labels = Dedup.clusters(one).collect()
    assert(labels.length == 1)
    assert(labels.head.getAs[Long]("cluster_rep") == 42L)
    assert(labels.head.getAs[Int]("is_kept") == 1)
  }

  test("q54 approx-quantile verdicts hold and the sketch is a real aggregate") {
    val rows = queries.CoreQueries.defs("q54_quantile_sketch")(spark, sfDir).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getLong(0) > 0)
    (1 to 4).foreach(i => assert(r.getInt(i) == 1, s"rank guarantee violated at col $i"))
    val plan = queries.CoreQueries.defs("q54_quantile_sketch")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("approx_percentile") || plan.contains("percentile_approx"),
      s"expected the GK sketch aggregate in the plan:\n$plan")
  }

  test("x11 constraint audit: clean checks report zero, the planted violation detects") {
    val out = queries.SqlSurfaceQueries.defs("x11_sql_constraints")(spark, sfDir)
    val rows = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("lineitem_fk_orders") == 0L)
    assert(rows("lineitem_qty_positive") == 0L)
    assert(rows("orders_custkey_not_null") == 0L)
    assert(rows("orders_pk_unique") == 0L)
    assert(rows("orders_status_accepted") == 0L)
    // the deliberately-violated accepted-values check must DETECT
    assert(rows("lineitem_returnflag_in_A_N") > 0L,
      "the audit failed to detect the planted returnflag violation")
  }

  test("x11 fused audit is one lineitem scan and row-identical to the portable UNION ALL form") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val e = graft.GraftEngine.cachedForDir(spark, sfDir)
    val fused = e.sql(queries.SqlSurfaceQueries.ConstraintAuditFusedSql)
    // row-identity with the reference form (the DuckDB oracle text)
    val portable = e.sql(queries.SqlSurfaceQueries.ConstraintAuditSql)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(fused.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == portable, "fused audit diverged from the portable UNION ALL form")
    // scan budget: ONE lineitem pass (FK left join carries the CASE
    // counts), TWO orders passes (the key projection + the aggregate) —
    // the portable form pays one full scan per check (4 + 3)
    val scans = fused.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.mkString(",")
        case _ => ""
      }
    }
    assert(scans.count(_.contains("lineitem")) == 1,
      s"fused audit must read lineitem exactly once: $scans")
    assert(scans.count(_.contains("orders")) <= 2,
      s"fused audit must read orders at most twice: $scans")
  }

  test("q56 chi-square: correct df, consistent verdict, non-negative statistic") {
    val r = queries.CoreQueries.defs("q56_chi2")(spark, sfDir).collect()(0)
    val orders = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(r.getLong(0) == orders)
    val chi2 = r.getDouble(1)
    assert(chi2 >= 0.0)
    assert(r.getInt(2) == 8, "5 priorities x 3 statuses -> df 8")
    assert(r.getInt(3) == (if (chi2 > 15.507) 1 else 0))
  }

  test("q57 OLS recovers an exactly-linear relation; |r| <= 1 on real data") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // y = 2x + 3 exactly -> r = 1, slope = 2, intercept = 3
    val dir = java.nio.file.Files.createTempDirectory("ols").toString
    (1 to 20).map(i => ("A", i.toDouble, 2.0 * i + 3.0))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val row = queries.CoreQueries.defs("q57_corr_ols")(spark, dir).collect()(0)
    assert(row.getDouble(2) == 1.0 && row.getDouble(3) == 2.0 && row.getDouble(4) == 3.0,
      s"exact line not recovered: $row")
    // and on the fixture: a correlation is always in [-1, 1]
    val real = queries.CoreQueries.defs("q57_corr_ols")(spark, sfDir).collect()
    assert(real.length == 3)
    real.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0))
  }
}
