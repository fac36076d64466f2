package graft

import java.nio.file.{Files, Paths}

/** Regenerates PLANS.md: the formatted physical plan of each headline
  * query plus the scale property it is expected to exhibit — the
  * audit-by-reading companion to the plan-shape ScalaTest asserts.
  *
  * Usage: `sbt "runMain graft.PlanAudit"` (writes /root/repo/PLANS.md).
  */
object PlanAudit {

  /** query key → the scale-critical property its plan must show. */
  val Audited: Seq[(String, String)] = Seq(
    "q02_filter" -> ("Filter + projection reach the parquet scan " +
      "(`PushedFilters`, pruned `ReadSchema`) — no post-scan filtering of dropped columns."),
    "q05_join_inner" -> ("No forced broadcast hint: the build side is " +
      "CBO/AQE's choice, so a fact-sized 'dimension' can never OOM a hard hint."),
    "q07_multijoin" -> ("Fact-fact joins shuffle on their keys; the tiny " +
      "nation/region dimensions ride broadcast joins."),
    "q09_topk" -> "Global ORDER BY + LIMIT plans as `TakeOrderedAndProject`, not a full sort.",
    "q33_salted_agg" -> ("Two-phase salted aggregation: partial_sum before " +
      "both exchanges; the second (merge) exchange carries only key x salt rows."),
    "d02_dedup_minhash" -> ("Near-dup candidates via equi-join on (band, bucket) " +
      "— a shuffled join on the bucket key, no cartesian/nested-loop anywhere."),
    "s01_topk_cosine" -> ("Query side broadcast; per-query top-k is " +
      "`WindowGroupLimit`, so every task forwards only its local top-k before the shuffle."),
    "s04_ann_kmeans" -> ("k-means IVF search over the STORED index " +
      "(round 8): the centroid side is a 16-row parquet scan of the " +
      "committed artifact — NO Lloyd-training subtree (aggregations, " +
      "checkpoints) appears in the query plan; assignment stays the " +
      "map-side broadcast fold, the probe join an equi-join on the cell id."),
    "s05_cluster_stats" -> ("Cluster cartography over the same stored " +
      "index: one corpus scan, map-side assignment fold, stats as one " +
      "partial-aggregated groupBy on nCentroids keys."),
    "s03_ann_ivf" -> ("Cell assignment is a map-side fold over the one-row " +
      "broadcast centroid array — the corpus is never hash-partitioned by vec_id."),
    "t03_tokens" -> "Pure map-side projection: a single scan, no Exchange before the output sort.",
    "q30_stream_batch" -> ("Windowed aggregation with partial aggregates " +
      "before the single (window, event_type) exchange — the same shape the streaming twin runs incrementally."),
    "h01_pricing_summary" -> ("TPC-H Q1: every aggregate runs partial " +
      "(map-side) before ONE exchange on the two grouping keys; the shipdate filter is pushed to the scan."),
    "h17_small_qty_revenue" -> ("Correlated scalar subquery (per-part avg " +
      "quantity) DECORRELATED by Catalyst into an aggregate + join — no per-row re-execution of the subquery."),
    "h21_waiting_suppliers" -> ("EXISTS and NOT EXISTS over the same fact " +
      "table plan as left-semi and left-anti hash joins on l_orderkey — never a nested-loop re-scan per outer row."),
    "x01_sql_dedup_keep" -> ("SQL over the operator view: the view boundary " +
      "is transparent to Catalyst — the keep_id predicate and column pruning optimize into the dedup operator's own aggregation."),
    "p03_split" -> ("Deterministic hash-split: the train/val/test assignment " +
      "is a pure map-side md5 projection — the only Exchange is the reporting groupBy AFTER assignment."),
    "p04_mixture" -> ("Mixture rebalance: per-domain counts are a tiny " +
      "partial-aggregated groupBy; the keep decision joins the corpus to the " +
      "broadcast threshold table — the corpus itself is scanned once and never shuffled."),
    "p05_pack_shards" -> ("Blocked distributed prefix sum: the corpus-side " +
      "running total is a Window PARTITIONED BY the block key (bounded rows per partition); " +
      "the single-partition window runs only over the n/blockSize block-totals aggregate. " +
      "One corpus shuffle, on the block key."),
    "d10_dedup_substring" -> ("Sliding-window span dedup: window generation is " +
      "codegen'd transform+explode inside the scan stage; pairing is an equi-join on " +
      "the window hash (df-capped — boilerplate windows are dropped before the join, " +
      "bounding bucket skew); the run-length window partitions by the PAIR key, " +
      "never a global window."),
    "p06_leakage_safe_split" -> ("Cluster-keyed split: d06's label table feeds a " +
      "pure map-side hash CASE on cluster_rep — the split assignment adds ZERO " +
      "shuffles on top of the clustering, so leakage safety is free at any scale."),
    "h02_min_cost_supplier" -> ("Correlated scalar MIN (per-part min supply cost " +
      "over a 4-table join) DECORRELATED into one grouped aggregate joined back on " +
      "ps_partkey — the subquery's join tree runs ONCE, never per outer row; " +
      "region/nation ride broadcast joins; the derived partsupp is a map-side " +
      "cross of part with two broadcast one/4-row frames."),
    "h20_excess_stock" -> ("Correlated aggregate (per-(part,supplier) lineitem sum) " +
      "nested inside IN: Catalyst rewrites both levels to aggregates + semi-joins " +
      "on the (l_partkey, l_suppkey) and s_suppkey keys — the deepest decorrelation " +
      "in the suite, still zero nested-loop re-scans."),
    "x06_sql_ann_default" -> ("The default ANN surface from SQL: the trained " +
      "centroid table is a checkpointed leaf (built once per engine by " +
      "registerAnnView), cell assignment folds over its one-row broadcast form " +
      "map-side, and the rank<=5 predicate prunes through the view into the " +
      "WindowGroupLimit."),
    "p07_stratified_sample" -> ("Exact-count stratified sample: the " +
      "rank<=k filter over the hash-ordered window plans as WindowGroupLimit — " +
      "each map task keeps its local top-k per stratum BEFORE the one " +
      "stratum-key shuffle, so a billion-row stratum moves k·tasks rows and " +
      "never sorts globally."),
    "x07_sql_merge" -> ("MERGE from SQL: the post-merge read is a plain " +
      "pruned parquet scan of the committed snapshot (the view re-points after " +
      "the atomic manifest rename) — readers never carry merge machinery in " +
      "their plans; the merge itself paid ONE anti-join shuffle at write time."),
    "q39_multi_distinct" -> ("Two COUNT(DISTINCT) on different columns split " +
      "into Expand-free single-distinct branches (partial dedup map-side, " +
      "shuffle bounded by |distinct pairs| not 3x table rows) joined on the " +
      "3-row group key. Remaining sf0.1 cost (~1.2s) is the exact-decimal " +
      "sum_qty discipline plus two pruned scans — the Expand is gone; " +
      "sub-second needs dropping oracle-exact decimals (see h01_fast_double)."),
    "t08_tfidf" -> ("tf-idf in ONE documents scan: document frequency is a " +
      "COUNT over a word-partitioned window on the tf aggregate instead of a " +
      "groupBy(word)+self-join, which evaluated the whole explode→groupBy " +
      "subtree twice. Per-word window partitions are Zipf-bounded by n_docs; " +
      "per-doc top-3 stays WindowGroupLimit."),
    "d11_span_decontam" -> ("Span-level benchmark decontamination: the " +
      "benchmark's distinct window hashes BROADCAST (bench suites are small " +
      "by definition), so the corpus streams map-side through the hash join " +
      "and is never shuffled by window hash; the only corpus shuffle is the " +
      "doc_id-keyed run-assembly window, rows bounded by per-doc hit count. " +
      "No self-join anywhere — cheaper than d10 by construction."),
    "t11_collocations" -> ("PMI collocation mining: bigram generation is a " +
      "generator inside the scan stage; bigram and unigram counts both take " +
      "map-side partial aggregates (vocabulary-sized shuffles, never " +
      "corpus-sized); the freq floor prunes the Zipf tail BEFORE the two " +
      "unigram joins (unhinted — AQE picks broadcast vs shuffle by real " +
      "vocab size); corpus total is a one-row broadcast; top-100 plans as " +
      "TakeOrderedAndProject."),
    "s06_ann_quantized" -> ("int8-quantized ANN: quantization and " +
      "dequantized scoring are map-side projections over the corpus scan " +
      "(the 4x-smaller representation is what streams at 10^9 vectors); " +
      "query side broadcast, per-query top-k as WindowGroupLimit — s01's " +
      "shape with a narrower corpus."),
    "s07_ann_admit" -> ("Incremental ANN admission: the arriving batch is " +
      "assigned to the STORED centroids by the map-side broadcast fold — " +
      "O(batch) work, a 16-row artifact scan, no training subtree, and the " +
      "history corpus nowhere in the plan."),
    "d12_semantic_dedup" -> ("SemDeDup: pairwise cosine is confined to the " +
      "stored k-means cells — the self-join is an equi-join on the cell id " +
      "(O(sum cell^2), cluster count the dial), never a cartesian; cell " +
      "assignment is the map-side broadcast-centroid fold."),
    "d13_bloom_decontam" -> ("Bloom-prefiltered decontamination: the " +
      "benchmark collapses to a BloomFilterAggregate bitset probed " +
      "MAP-SIDE over the corpus scan (might_contain in the scan-stage " +
      "filter); only the surviving sliver reaches the exact confirm join, " +
      "so the corpus is never shuffled by shingle."),
    "t13_bpe_pairs" -> ("BPE pair counts: pairs explode per UNIQUE word " +
      "weighted by its count — the only corpus-sized exchange is t07's " +
      "word-count shuffle; the pair aggregate is vocabulary-sized; top-k " +
      "plans as TakeOrderedAndProject."),
    "p08_source_cap" -> ("Per-source quota: rank<=k plans as " +
      "WindowGroupLimit, so each map task pre-trims to k rows per source " +
      "BEFORE the source-key shuffle — the low-cardinality partition key " +
      "carries O(k x tasks x sources) rows however hot a domain is."),
    "p09_token_budget" -> ("Token-budget selection: the corpus running " +
      "sum shuffles on the 2-hex-char hash-prefix block key " +
      "(hashpartitioning(__block)); the only unpartitioned window runs " +
      "over the 256-row block-total aggregate — no corpus-sized " +
      "single-partition window anywhere."),
    "d14_cdc_dedup" -> ("Content-defined chunking: cut positions and chunk " +
      "substrings are array expressions inside the scan stage (no per-doc " +
      "window, no positional shuffle); the single corpus-sized exchange is " +
      "the partial-aggregated groupBy on chunk content — d01's one-shuffle " +
      "discipline at sub-document granularity."),
    "d17_dedup_segments" -> ("Segment rewrite dedup: segment generation is a " +
      "map-side posexplode inside the scan stage; the keep-first decision is " +
      "a partial-aggregated min on the segment hash (boilerplate hashes " +
      "arrive pre-combined — the skew lives in the decision join, which AQE " +
      "splits), and reassembly is one groupBy per doc. No windows over " +
      "unbounded partitions, no driver-side pass."),
    "q20_rollup" -> ("ROLLUP as hierarchical re-aggregation: NO Expand " +
      "operator (native rollup would scan-multiply the corpus once per " +
      "grouping set); the corpus aggregates once to the finest grain and " +
      "the coarser levels re-aggregate the group-cardinality table, " +
      "reusing the base exchange (ReusedExchange/stage reuse in the " +
      "executed plan). Decimal sums stay exact through every level."),
    "s09_ann_pq" -> ("Product-quantized ANN: the corpus-sized scan reads " +
      "the STORED codes artifact (the 32-bit-per-vector compressed " +
      "corpus) — no training subtree, no float-vector scan before the " +
      "shortlist; codebooks and per-query dot tables ride broadcast " +
      "joins; full-precision vectors join in only for the R-row " +
      "shortlist re-rank; final top-k is WindowGroupLimit."),
    "s08_hybrid_rrf" -> ("Hybrid RRF: both retrieval arms keep their " +
      "corpus-scale shapes (BM25's vocabulary-sized shuffles; the cosine " +
      "arm's broadcast query + WindowGroupLimit); the fusion join and " +
      "final re-rank touch only the two top-k pools, so the single " +
      "unpartitioned rank window is bounded at pool size by construction."),
    "q47_funnel" -> ("Ordered funnel: ONE hash exchange on user_id; the " +
      "whole stage sequence evaluates map-side per user (sort_array + " +
      "aggregate fold) — no per-stage self-join of the event log, no global window."),
    "q48_retention" -> ("Cohort retention: NO window operator anywhere; the " +
      "cohort aggregate and the events-to-cohort join shuffle on the SAME " +
      "user key; count-distinct partial-aggregates before the (cohort, offset) exchange."),
    "q49_transitions" -> ("Markov transitions: the lead() window partitions " +
      "by user_id (one corpus exchange); the probability-normalization window " +
      "runs on the event-type×event-type rollup, never the corpus — no " +
      "Exchange SinglePartition in the plan."),
    "q50_ab_test" -> ("A/B z-test: one user-keyed aggregate, a 2-row arm " +
      "rollup, scalar arithmetic — the z expression evaluates on ONE row; " +
      "no broadcast, no window, nothing corpus-sized after the first exchange."),
    "d15_fuzzy_join" -> ("Fuzzy resolution: candidates via equi-join on the " +
      "blocking prefix (registry side DISTINCT, broadcast at this size); " +
      "levenshtein only inside blocks; best match is one groupBy string-min, no window."),
    "p10_dsir_select" -> ("DSIR selection: bucket stats from ONE conditional " +
      "aggregate; the 64-row weight table joins back BROADCAST (corpus never " +
      "shuffled by bucket); top-k is TakeOrderedAndProject."),
    "t15_classifier" -> ("Classifier inference: hash and weight lookup are " +
      "in-expression — the plan has NO join at all; the only exchange is the " +
      "per-doc aggregate."),
    "t16_bigram_ppl" -> ("Bigram-LM scoring: model tables are vocabulary-" +
      "sized aggregates (bigram counts checkpoint-shared); scoring joins are " +
      "vocab-keyed and AQE-sized; ONE doc-keyed corpus shuffle."),
    "x10_sql_profile" -> ("Profiling via the SQL view: per-column stats from " +
      "one pass + HLL sketches; the exact-distinct subtrees exist only in the " +
      "oracle-gate mode the view registers (q42-style verdict)."),
    "q51_attribution" -> ("Last-touch attribution: ONE corpus exchange (the " +
      "user-partitioned window — same key as funnel/sessionizer), then a " +
      "channel-cardinality rollup with partial aggregates; no self-join of the log."),
    "q52_scd2" -> ("SCD2 build: the change-detect lag window and the version/" +
      "interval windows share partition key AND ordering — exactly ONE hash " +
      "exchange and one sort in the whole plan (spec-pinned)."),
    "p11_weighted_sample" -> ("Priority sampling: priorities are map-side " +
      "expressions; top-(k+1) is TakeOrderedAndProject (per-partition top-k, " +
      "driver merges k+1 rows); tau is a one-row broadcast — no global sort, " +
      "no rangepartitioning exchange."),
    "t17_textrank" -> ("TextRank: the corpus collapses to the vocabulary-" +
      "sized edge list BEFORE the loop (generator-in-scan bigram aggregate); " +
      "the ten power iterations run over checkpointed single-partition inputs " +
      "— nothing corpus-sized iterates, no per-round driver materialization."),
    "q53_anomaly" -> ("Anomaly detection: the corpus aggregates to the " +
      "(type, day) series in ONE shuffle with map-side partials; the trailing " +
      "window partitions by event_type on that series — never a global window " +
      "over the corpus."),
    "t18_heavy_hitters" -> ("Heavy hitters: the Misra-Gries sketch aggregates " +
      "with map-side partials (one <=k-entry buffer per task through the " +
      "shuffle); the exact-count subtree exists only for the verdict oracle; " +
      "verdict joins are one-row broadcasts."),
    "m07_pixel_dedup" -> ("Pixel dedup: real decode stays map-side fan-in " +
      "(mapPartitions, a few output bytes per image); the only exchange " +
      "groups the tiny quantized signatures."),
    "q54_quantile_sketch" -> ("Approx quantiles: the GK sketch is one " +
      "mergeable aggregate pass; the rank-check pass joins the one-row " +
      "sketch result BROADCAST into a second conditional aggregate — two " +
      "corpus scans total, no sort anywhere."),
    "x11_sql_constraints" -> ("Constraint audit: each check is a full-scan " +
      "aggregate branch; referential integrity plans as LeftAnti hash join " +
      "(never a per-row subquery); branches union into a 6-row report."),
    "q55_gapfill" -> ("Gap-fill: the calendar generates from a one-row " +
      "envelope crossed with the key vocabulary (both broadcast — no " +
      "CartesianProduct); per-key anchor windows run on the densified " +
      "series, partitioned by key, never globally."),
    "q56_chi2" -> ("Chi-square: ONE corpus aggregate to the r x c cell " +
      "table; marginals, expectations, and the statistic are windows and " +
      "scalar arithmetic on 15 rows."),
    "q57_corr_ols" -> ("Corr/OLS: one corpus shuffle on the 3-value " +
      "grouping key producing exact-decimal power sums; the closed forms " +
      "evaluate per group row — nothing wider than the group count after " +
      "the aggregate."),
    "q58_silences" -> ("Silence detection: ONE corpus exchange (the " +
      "key-partitioned lead window); gap spans are row-local arithmetic — " +
      "no self-join, no global window."),
    "q59_cohort_ltv" -> ("Cohort LTV: the cohort join and revenue " +
      "aggregate shuffle on the user key; the cumulative-revenue window " +
      "runs on the (cohort, offset) rollup — cohort-sized, never the " +
      "corpus — and stays DECIMAL until the output cast."),
    "s10_ann_filtered" -> ("Filtered vector search: the label predicate " +
      "reaches the embeddings scan (PushedFilters) BEFORE cell " +
      "assignment; the stored centroid table reads as a 16-row parquet " +
      "scan (no training subtree); probes widen to 12 cells to " +
      "compensate filter selectivity."))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftEngine.session(GraftConfig(
      master = "local[8]", appName = "graft-plan-audit", shufflePartitions = 8))
    val out = new StringBuilder
    out ++= "# PLANS — physical-plan audit of the headline queries\n\n"
    out ++= "Generated by `sbt \"runMain graft.PlanAudit\"` against " +
      s"`$sfDir` (shuffle.partitions=8). Each section states the\n" +
      "scale property the plan must exhibit, then the formatted plan;\n" +
      "the same properties are enforced by the plan-shape ScalaTest\n" +
      "asserts, so this file is documentation, not the gate.\n"
    Audited.foreach { case (name, property) =>
      val df = graft.queries.Queries.all(name)(spark, sfDir)
      val plan = GraftEngine.explainPlan(df).trim
      out ++= s"\n## $name\n\n$property\n\n```\n$plan\n```\n"
    }
    // cwd-relative: sbt runs in the repo root, and the tool stays
    // portable to any checkout location
    Files.writeString(Paths.get("PLANS.md"), out.toString)
    println(s"[plan-audit] wrote PLANS.md (${Audited.size} queries)")
    spark.stop()
  }
}
