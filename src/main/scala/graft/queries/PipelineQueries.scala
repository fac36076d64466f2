package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import Ops._

/** Composed end-to-end pipeline: the training-data-prep flow the
  * operator families exist for, as ONE declarative plan —
  *
  *   quality gate → exact dedup (keep lowest id per fingerprint) →
  *   per-language corpus/token budget.
  *
  * Scale shape: the quality gate and fingerprinting are map-side; dedup
  * is one shuffle on the 128-bit fingerprint (window-min, no join-back);
  * the final rollup is a partial-aggregated groupBy on language. Three
  * stages total for the whole prep flow, each on a key with bounded
  * cardinality skew.
  */
object PipelineQueries {

  val defs: Map[String, Q] = Map(
    "p01_training_prep" -> ((s, dir) => {
      val enriched = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
        .withColumn("n_words", wsTokenCount(col("text")))
        .withColumn("punct_ratio", punctRatio(col("text")))
        .withColumn("fp", fingerprint(col("text")))
        .filter(col("n_words") >= 10 && col("punct_ratio") <= 0.3)
      val deduped = enriched
        .withColumn("keep_id", min(col("doc_id")).over(Window.partitionBy("fp")))
        .filter(col("doc_id") === col("keep_id"))
      deduped.groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("total_words"),
        sum(bpeTokenCount(col("text"))).as("total_tokens"))
        .orderSmall("lang")
    }),

    // p02: the NEAR-dup curation flow — cluster resolution (d06) keeps
    // one canonical doc per near-dup cluster, survivors are PII-redacted
    // (t05), quality-gated (t02) and token-budgeted (t03) per language.
    // Scale shape: the keep set reads the STORED cluster-label artifact
    // (built once per corpus snapshot — see Dedup.storedClusters); the
    // keep-set join is a semi-join on doc_id; everything after is
    // map-side until the final partial-aggregated groupBy(lang).
    "p02_neardup_prep" -> ((s, dir) => {
      implicit val spark = s
      // fan the survivor redact/count chain (regex-heavy per row;
      // ABBA A/B at sf0.1: fan faster in 5 of 6 interleaved pairs,
      // min 1.06 -> 0.93 s); the cluster-index read stays unfanned
      val docs = fanScan(t(s, dir, "documents"))
      val kept = graft.operators.Dedup
        .storedClusters(docs, DedupQueries.clusterIndexPath(dir))
        .filter(col("is_kept") === 1).select("doc_id")
      docs.join(kept, Seq("doc_id"), "left_semi")
        .withColumn("clean_text", piiRedact(col("text")))
        .withColumn("n_words", wsTokenCount(col("clean_text")))
        .withColumn("punct_ratio", punctRatio(col("clean_text")))
        .filter(col("n_words") >= 10 && col("punct_ratio") <= 0.3)
        .groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("total_words"),
          sum(bpeTokenCount(col("clean_text"))).as("total_tokens"))
        .orderSmall("lang")
    }),

    // p03: deterministic hash-split — stable train/val/test assignment
    // (≈80/10/10) that survives reruns, backfills and repartitioning;
    // pure map-side, no shuffle (see operators.Splits)
    "p03_split" -> ((s, dir) => {
      graft.operators.Splits.assignSplit(
        t(s, dir, "documents"), col("doc_id"))
        .groupBy("lang", "split").agg(count(lit(1)).as("n_docs"))
        .orderSmall("lang", "split")
    }),

    // p04: domain-mixture rebalance — every language downsampled (in
    // expectation) to the smallest language's size via deterministic
    // hash thresholds; corpus scanned once, broadcast threshold join
    "p04_mixture" -> ((s, dir) => {
      graft.operators.Splits.rebalanceDomains(
        t(s, dir, "documents"), col("lang"), col("doc_id"))
        .select("doc_id", "lang").orderBy("doc_id")
    }),

    // p05: greedy shard packing — rows assigned in id order to
    // consecutive ≈1000-token shards via the blocked distributed
    // prefix sum (no global window over the corpus; blockSize=100 so
    // the blocked path is exercised even at sf0.01)
    "p05_pack_shards" -> ((s, dir) => {
      graft.operators.Splits.packShards(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        col("doc_id"), wsTokenCount(col("text")),
        budget = 1000L, blockSize = 100L)
        .select("doc_id", "n_tokens", "shard").orderBy("doc_id")
    }),

    // p06: leakage-safe split — hash-split by the near-dup CLUSTER
    // representative, not the doc id, so every member of a duplicate
    // cluster lands in the SAME split (near-dups straddling train/test
    // are the classic eval-contamination failure of naive per-doc
    // splitting). Pure composition: d06's cluster labels + p03's
    // deterministic hash split, keyed on cluster_rep.
    "p06_leakage_safe_split" -> ((s, dir) => {
      implicit val spark = s
      val labels = graft.operators.Dedup.storedClusters(
        t(s, dir, "documents"), DedupQueries.clusterIndexPath(dir))
      graft.operators.Splits.assignSplit(labels, col("cluster_rep"))
        .select("doc_id", "cluster_rep", "split").orderBy("doc_id")
    }),

    // p07: exact-count stratified sample — exactly 40 docs per language
    // by seeded-hash rank (balanced eval-set construction; the
    // rank<=k filter triggers WindowGroupLimit, so map tasks pre-trim
    // to k per stratum before the one stratum-key shuffle)
    "p07_stratified_sample" -> ((s, dir) => {
      graft.operators.Splits.stratifiedSample(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        col("lang"), col("doc_id"), k = 40)
        // BIGINT rank on both sides (h12's lesson: Spark row_number is
        // INT, DuckDB's is BIGINT — pin one representation)
        .select(col("doc_id"), col("lang"),
          col("sample_rank").cast("long").as("sample_rank"))
        .orderBy("doc_id")
    }),

    // p08: per-source quota curation — keep the top-CapPerSource docs
    // per source BY QUALITY (t02's composite score), the
    // RefinedWeb/C4-style per-domain cap that stops any one domain
    // from dominating the training mix while keeping its best pages
    // (p07 samples uniformly per stratum; this ranks by merit).
    // Scale shape: the rank<=k filter plans as WindowGroupLimit, so
    // every map task pre-trims to k rows per source BEFORE the
    // source-key shuffle — the shuffle carries O(k × tasks × sources)
    // rows no matter how hot a domain is, which is what makes a
    // low-cardinality partition key safe here.
    "p08_source_cap" -> ((s, dir) => {
      val nw = wsTokenCount(col("text"))
      val q = when(nw.between(10, 500), 1.0).otherwise(0.5) *
        (lit(1.0) - punctRatio(col("text")))
      val w = Window.partitionBy("source")
        .orderBy(col("quality_score").desc, col("doc_id"))
      t(s, dir, "documents")
        .select(col("source"), col("doc_id"), q.as("quality_score"))
        .withColumn("cap_rank", row_number().over(w).cast("long"))
        .filter(col("cap_rank") <= CapPerSource)
        .orderBy("source", "cap_rank")
    }),

    // p09: token-budget corpus selection — the maximal seeded-hash-
    // order prefix whose cumulative whitespace-token count stays under
    // the budget ("train on exactly N tokens", unbiased and rerun-
    // stable). Blocked prefix sum keyed on the hash prefix; no
    // corpus-sized global window (see Splits.tokenBudgetSample).
    "p09_token_budget" -> ((s, dir) =>
      graft.operators.Splits.tokenBudgetSample(
        t(s, dir, "documents"), col("doc_id"), wsTokenCount(col("text")),
        budget = TokenBudget)
        .orderBy("doc_id")),

    // p10 DSIR-style importance selection (Data Selection via
    // Importance Resampling, Xie et al. 2023): rank raw docs by how
    // target-like their hashed-unigram distribution is. Each token
    // hashes into DsirBuckets features; bucket probabilities for the
    // TARGET slice (lang = en) and the RAW corpus come from ONE
    // conditional aggregate over one token scan; the per-doc importance
    // weight is Σ log(p_target(b)/p_raw(b)), Laplace-smoothed. The
    // 64-row weight table broadcasts into the scoring join, so the
    // corpus-side work is two token scans (stats pass + scoring pass —
    // the alternative materializes corpus-sized token rows) and ONE
    // doc-keyed shuffle; top-k plans as TakeOrderedAndProject. Per-term
    // logs round to 6 dp and sum in exact decimal (t10's discipline),
    // so the top-k cut is engine-identical.
    "p10_dsir_select" -> ((s, dir) => dsirSelect(s, dir, exactDecimal = true)),

    // p12: token-budget selection under TRUE tokenizer counts — p09's
    // blocked prefix sum fed by t20's BPE encoder instead of the
    // whitespace proxy ("train on exactly N BPE tokens", the budget a
    // real pretraining run actually has). The count column is t20's
    // per-doc n_bpe_tokens (trainer's final vocabulary broadcast into
    // one doc-keyed rollup — per-word work stays vocabulary-sized);
    // the selection adds p09's 256-block distributed prefix sum on a
    // fresh seed. Docs with no trainer-eligible words carry no tokens
    // and are outside the selection domain in both engines (the
    // encode join is inner on both sides).
    "p12_bpe_budget" -> ((s, dir) =>
      graft.operators.Splits.tokenBudgetSample(
        TextQueries.bpeEncode(s, dir), col("doc_id"), col("n_bpe_tokens"),
        budget = TokenBudget, seed = "bpe")
        .orderBy("doc_id")),

    // p11 weighted sampling without replacement (priority sampling,
    // Duffield-Lund-Thorup): keep PriK docs weighted by character
    // count, with the threshold-adjusted unbiased weight estimate.
    // Ordered by priority so the sample reads rank-first.
    "p11_weighted_sample" -> ((s, dir) =>
      graft.operators.Splits.prioritySample(
        t(s, dir, "documents"), col("doc_id"), col("n_chars"), k = PriK)
        .orderBy(col("priority").desc, col("doc_id"))))

  /** p10's plan in both decimal modes. `exactDecimal = true` sums the
    * 6-dp per-term logs in DECIMAL(28,6) so the top-k cut is engine-
    * identical (the oracle discipline); false is the production mode —
    * plain double sums, same plan (the h01/q57/t16 dual-mode pattern;
    * FastMathSpec bounds the twin's drift at 1e-9 relative). */
  private[graft] def dsirSelect(s: org.apache.spark.sql.SparkSession, dir: String,
      exactDecimal: Boolean): org.apache.spark.sql.DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val toks = fanScan(t(s, dir, "documents"))
      .select(col("doc_id"), (col("lang") === DsirTargetLang).as("is_target"),
        explode(words(col("text"))).as("word"))
      .withColumn("b",
        conv(substring(md5(concat(lit("dsir|"), col("word"))), 1, 4), 16, 10)
          .cast("long") % DsirBuckets)
    val stats = toks.groupBy("b").agg(
      count(lit(1)).as("cr"),
      sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"))
      .localCheckpoint(eager = false) // 64 rows, read twice below
    val tot = stats.agg(sum(col("cr")).as("r"), sum(col("ct")).as("t"))
    val wts = stats.crossJoin(broadcast(tot))
      .select(col("b"), round(log(
        ((col("ct") + lit(1)).cast("double") / (col("t") + lit(DsirBuckets)).cast("double")) /
          ((col("cr") + lit(1)).cast("double") / (col("r") + lit(DsirBuckets)).cast("double"))),
        6).as("w"))
    val logwSum =
      if (exactDecimal) sum(col("w").cast(dec)).cast("double")
      else sum(col("w"))
    toks.join(broadcast(wts), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        logwSum.as("logw"))
      .orderBy(col("logw").desc, col("doc_id"))
      .limit(DsirTopK)
  }

  /** Bench hook: p10 in production (double-sum) mode. */
  def dsirSelectFast(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    dsirSelect(s, dir, exactDecimal = false)

  /** p08 quota: max docs kept per source/domain. */
  val CapPerSource = 10

  /** p09 budget: absolute token cap for the selected sub-corpus. */
  val TokenBudget = 8000L

  /** p10 DSIR: hashed-feature width, target slice, and selection size.
    * 64 buckets keeps the weight table broadcast-trivial; the published
    * method uses 10⁴–10⁵ hashed n-gram buckets — still broadcast-sized. */
  val DsirBuckets = 64
  val DsirTargetLang = "en"
  val DsirTopK = 50

  /** p11 priority-sampling size. */
  val PriK = 100

  val oracles: Map[String, String] = Map(
    "p01_training_prep" ->
      s"""WITH enriched AS (
         |  SELECT doc_id, lang, text,
         |    ${sqlWsTokenCount("text")} AS n_words,
         |    ${sqlPunctRatio("text")} AS punct_ratio,
         |    ${sqlFingerprint("text")} AS fp
         |  FROM documents),
         |gated AS (SELECT * FROM enriched WHERE n_words >= 10 AND punct_ratio <= 0.3),
         |deduped AS (
         |  SELECT * FROM (SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS keep_id
         |                 FROM gated)
         |  WHERE doc_id = keep_id)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(n_words) AS BIGINT) AS total_words,
         |  CAST(SUM(${sqlBpeTokenCount("text")}) AS BIGINT) AS total_tokens
         |FROM deduped GROUP BY lang ORDER BY lang""".stripMargin,

    "p02_neardup_prep" ->
      s"""${DedupQueries.sqlClusterCtes},
         |kept AS (SELECT src AS doc_id FROM reach GROUP BY src
         |  HAVING MIN(dst) = src),
         |cleaned AS (
         |  SELECT d.doc_id, d.lang, ${sqlPiiRedact("d.text")} AS clean_text
         |  FROM documents d JOIN kept USING (doc_id)),
         |enriched AS (
         |  SELECT *, ${sqlWsTokenCount("clean_text")} AS n_words,
         |    ${sqlPunctRatio("clean_text")} AS punct_ratio
         |  FROM cleaned)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(n_words) AS BIGINT) AS total_words,
         |  CAST(SUM(${sqlBpeTokenCount("clean_text")}) AS BIGINT) AS total_tokens
         |FROM enriched WHERE n_words >= 10 AND punct_ratio <= 0.3
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "p03_split" ->
      """WITH assigned AS (
        |  SELECT lang,
        |    CASE WHEN substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
        |           THEN 'train'
        |         WHEN substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
        |           THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT lang, split, COUNT(*) AS n_docs
        |FROM assigned GROUP BY lang, split ORDER BY lang, split""".stripMargin,

    "p04_mixture" ->
      """WITH n AS (SELECT lang, COUNT(*) AS domain_n FROM documents GROUP BY lang),
        |m AS (SELECT MIN(domain_n) AS min_n FROM n),
        |t AS (SELECT lang, (256 * min_n) // domain_n AS thr FROM n, m)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN t ON d.lang = t.lang
        |WHERE '0' || substr(md5('mix|' || CAST(d.doc_id AS VARCHAR)), 1, 2)
        |  < printf('%03x', thr)
        |ORDER BY d.doc_id""".stripMargin,

    "p05_pack_shards" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${sqlWsTokenCount("text")} AS n_tokens FROM documents),
         |cum AS (
         |  SELECT doc_id, n_tokens,
         |    SUM(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
         |  FROM toks)
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST((c - n_tokens) // 1000 AS BIGINT) AS shard
         |FROM cum ORDER BY doc_id""".stripMargin,

    // d06's recursive-CTE clustering, then p03's hash thresholds keyed
    // on the cluster representative (205=0xcd, 230=0xe6)
    "p06_leakage_safe_split" ->
      s"""${DedupQueries.sqlClusterCtes},
         |labels AS (SELECT src AS doc_id, MIN(dst) AS cluster_rep
         |  FROM reach GROUP BY src)
         |SELECT doc_id, cluster_rep,
         |  CASE WHEN substr(md5('split|' || CAST(cluster_rep AS VARCHAR)), 1, 2) < 'cd'
         |         THEN 'train'
         |       WHEN substr(md5('split|' || CAST(cluster_rep AS VARCHAR)), 1, 2) < 'e6'
         |         THEN 'val'
         |       ELSE 'test' END AS split
         |FROM labels ORDER BY doc_id""".stripMargin,

    "p07_stratified_sample" ->
      """SELECT doc_id, lang, sample_rank FROM (
        |  SELECT doc_id, lang,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5('strat|' || CAST(doc_id AS VARCHAR)), doc_id)
        |      AS sample_rank
        |  FROM documents)
        |WHERE sample_rank <= 40 ORDER BY doc_id""".stripMargin,

    // p08: identical composite quality expression as t02's oracle so
    // the double value (and therefore the rank order) matches bitwise
    "p08_source_cap" ->
      s"""WITH scored AS (
         |  SELECT source, doc_id,
         |    (CASE WHEN ${sqlWsTokenCount("text")} BETWEEN 10 AND 500
         |          THEN 1.0 ELSE 0.5 END
         |      * (1.0 - ${sqlPunctRatio("text")})) AS quality_score
         |  FROM documents)
         |SELECT source, doc_id, quality_score, cap_rank FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY quality_score DESC, doc_id) AS cap_rank
         |  FROM scored)
         |WHERE cap_rank <= $CapPerSource ORDER BY source, cap_rank""".stripMargin,

    // p09: the oracle's single global running sum IS the semantics the
    // blocked Spark plan reproduces piecewise
    "p09_token_budget" ->
      s"""WITH tk AS (SELECT doc_id,
         |    CAST(${sqlWsTokenCount("text")} AS BIGINT) AS n_tokens,
         |    md5('budget|' || CAST(doc_id AS VARCHAR)) AS h
         |  FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |    SUM(n_tokens) OVER (ORDER BY h, doc_id) AS cum_tokens
         |  FROM tk)
         |SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
         |FROM c WHERE cum_tokens <= $TokenBudget ORDER BY doc_id""".stripMargin,

    // p12: t20's encode chain (nested WITH) feeding p09's running-sum
    // form on the 'bpe' seed — the oracle's single global window IS
    // the semantics the blocked Spark plan reproduces piecewise
    "p12_bpe_budget" ->
      s"""WITH tok AS (${TextQueries.bpeEncodeOracleSql(TextQueries.BpeTrainSteps)}),
         |tk AS (SELECT doc_id, n_bpe_tokens AS n_tokens,
         |    md5('bpe|' || CAST(doc_id AS VARCHAR)) AS h
         |  FROM tok),
         |c AS (SELECT doc_id, n_tokens,
         |    SUM(n_tokens) OVER (ORDER BY h, doc_id) AS cum_tokens
         |  FROM tk)
         |SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
         |FROM c WHERE cum_tokens <= $TokenBudget ORDER BY doc_id""".stripMargin,

    // p10: identical hash/smoothing/log parenthesization — all inputs
    // integer-exact, one double expression, 6-dp round, exact-decimal
    // per-doc sum → identical top-k cut
    "p10_dsir_select" ->
      s"""WITH toks AS (SELECT doc_id, lang = '$DsirTargetLang' AS is_target,
         |    unnest(${sqlWords("text")}) AS word FROM documents),
         |tb AS (SELECT doc_id, is_target,
         |    ('0x' || substr(md5('dsir|' || word), 1, 4))::BIGINT % $DsirBuckets AS b
         |  FROM toks),
         |stats AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr,
         |    CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS ct
         |  FROM tb GROUP BY b),
         |tot AS (SELECT SUM(cr) AS r, SUM(ct) AS t FROM stats),
         |w AS (SELECT b, round(ln(
         |      ((ct + 1) / CAST(t + $DsirBuckets AS DOUBLE))
         |    / ((cr + 1) / CAST(r + $DsirBuckets AS DOUBLE))), 6) AS w
         |  FROM stats CROSS JOIN tot)
         |SELECT doc_id, COUNT(*) AS n_tokens,
         |  CAST(SUM(CAST(w AS DECIMAL(28,6))) AS DOUBLE) AS logw
         |FROM tb JOIN w USING (b) GROUP BY doc_id
         |ORDER BY logw DESC, doc_id LIMIT $DsirTopK""".stripMargin,

    // p11: identical 52-bit md5 uniform, identical single-division
    // priority, identical threshold rule (SQL mirrors the <=k
    // whole-corpus edge case)
    "p11_weighted_sample" ->
      s"""WITH s AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
         |    CAST(n_chars AS DOUBLE) /
         |      (CAST(('0x' || substr(md5('pri|' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
         |            + 1 AS DOUBLE) / 4503599627370496.0) AS priority
         |  FROM documents),
         |t AS (SELECT * FROM s ORDER BY priority DESC, doc_id LIMIT ${PriK + 1}),
         |m AS (SELECT min(priority) AS tau, COUNT(*) AS m FROM t)
         |SELECT doc_id, weight, priority,
         |  CASE WHEN m.m = ${PriK + 1}
         |       THEN greatest(CAST(weight AS DOUBLE), m.tau)
         |       ELSE CAST(weight AS DOUBLE) END AS est_weight
         |FROM t CROSS JOIN m
         |WHERE (m.m = ${PriK + 1} AND priority > m.tau) OR m.m <= $PriK
         |ORDER BY priority DESC, doc_id""".stripMargin)
}
