package graft.queries

import graft.operators.{Dedup, Similarity}
import Ops._

/** Driver-contract wiring for similarity search s01–s02 (SURVEY.md §2
  * #23–#24). As with dedup, the DuckDB oracles are generated from the
  * same constants as the Spark operators (query count, k, sign-bucket
  * width, 6-dp rounding) so both engines rank identically.
  */
object SimilarityQueries {

  private val NQueries = 5

  /** s10's metadata filter: search only label-1 vectors (~10% of the
    * corpus — selective enough that post-filtering would visibly lose
    * results, the case filtered search exists for). */
  val FilteredLabel = 1

  /** s10 probes WIDER than s04 (12 of 16 cells vs 8): a selective
    * filter thins every probed cell, so filtered search scales the
    * probe count by roughly inverse selectivity (capped at all cells)
    * to keep the candidate pool top-k-deep — the standard vector-DB
    * filtered-search compensation. Measured: recall@10 0.68 at
    * nProbe 8 → 0.92/0.82 (sf0.001/sf0.01) at 12. */
  val FilteredNProbe = 12

  /** Canonical stored-centroid location for a corpus dir — keyed by the
    * embeddings SOURCE PATH so s04/s05 here and the engine's
    * `graft_ann_topk` view (x06) resolve the SAME committed artifact:
    * the index trains once per corpus, not once per query family. */
  def annIndexPath(dir: String): String =
    graft.sources.ArtifactStore.pathFor(
      graft.sources.ArtifactStore.defaultRoot, "ann_centroids",
      s"$dir/embeddings.parquet")

  /** Train-or-reuse the stored index for `dir` (fingerprint-guarded;
    * see [[graft.operators.Similarity.storedKmeansCentroids]]). Bench
    * calls this in its UNTIMED prepare step so queries measure search,
    * not index construction. */
  def ensureAnnIndex(s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    implicit val spark = s
    Similarity.storedKmeansCentroids(t(s, dir, "embeddings"), annIndexPath(dir))
    ()
  }

  /** Canonical stored semantic-dedup assignment location for a corpus
    * dir ([[graft.operators.Similarity.storedSemanticAssignments]] —
    * the adaptive-cell-count index d12 reads; distinct from the
    * 16-cell s04 ANN index, whose probe economics want FEW cells while
    * SemDeDup's pairwise stage wants cell POPULATION bounded). */
  def semIndexPath(dir: String): String =
    graft.sources.ArtifactStore.pathFor(
      graft.sources.ArtifactStore.defaultRoot, "semdedup_cells",
      s"$dir/embeddings.parquet")

  /** Train-or-reuse the stored semantic-dedup assignments for `dir`
    * (Bench's untimed prepare; d12 then measures the within-cell
    * pairwise dedup, not training or the O(n·k) assignment pass). */
  def ensureSemIndex(s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    implicit val spark = s
    Similarity.storedSemanticAssignments(t(s, dir, "embeddings"), semIndexPath(dir))
    ()
  }

  /** Canonical stored-PQ-index locations (codebooks + encoded corpus)
    * for a corpus dir. */
  def pqIndexPaths(dir: String): (String, String) = {
    def p(kind: String) = graft.sources.ArtifactStore.pathFor(
      graft.sources.ArtifactStore.defaultRoot, kind,
      s"$dir/embeddings.parquet")
    (p("pq_codebooks"), p("pq_codes"))
  }

  /** Train-or-reuse the stored PQ index for `dir` (Bench's untimed
    * prepare; s09 then measures ADC search + re-rank, not training). */
  def ensurePqIndex(s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    implicit val spark = s
    val (cb, codes) = pqIndexPaths(dir)
    Similarity.storedPqIndex(t(s, dir, "embeddings"), cb, codes)
    ()
  }

  private val sqlDot = Ops.sqlListDot("q.qv", "c.v")
  private val sqlQNorm = Ops.sqlListNorm("q.qv")
  private val sqlCNorm = Ops.sqlListNorm("c.v")

  private val sqlPrep =
    s"""e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $NQueries)""".stripMargin

  // ---- shared k-means CTE chain (s04 search + s05 cluster stats) ---------
  // DuckDB replay of graft.operators.Similarity.kmeansCentroids: cents0 =
  // first-N init; each Lloyd iteration is (assign via ROW_NUMBER on 6-dp
  // cosine, ties to lowest cent_id; element-wise mean as exact decimal
  // sum / count; emptied cells keep their previous centroid) — generated
  // for KmeansIters iterations from the same constants the Spark
  // operator uses. Ends with `$cf` (final centroids) and `assignF`
  // (per-vector cell assignment).
  private def norm(e: String) = Ops.sqlListNorm(e)
  private def sqlKmDot(a: String, b: String) = Ops.sqlListDot(a, b)
  private val cf = s"cents${Similarity.KmeansIters}"
  private val sqlKmeansChain: String = {
    val iterCtes = (1 to Similarity.KmeansIters).map { i =>
      val prev = s"cents${i - 1}"
      s"""assign$i AS (
         |  SELECT vec_id, v, cell FROM (
         |    SELECT e.vec_id, e.v, c.cent_id AS cell,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY round(${sqlKmDot("e.v", "c.cv")} / (${norm("e.v")} * ${norm("c.cv")}), 6) DESC,
         |          c.cent_id ASC) AS rn
         |    FROM e CROSS JOIN $prev c) WHERE rn = 1),
         |sums$i AS (
         |  SELECT cell, pos, CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS m
         |  FROM (SELECT cell, unnest(v) AS x, unnest(range(1, len(v) + 1)) AS pos FROM assign$i)
         |  GROUP BY cell, pos),
         |means$i AS (SELECT cell, list(m ORDER BY pos) AS new_cv FROM sums$i GROUP BY cell),
         |cents$i AS (
         |  SELECT c.cent_id, coalesce(m.new_cv, c.cv) AS cv
         |  FROM cents${i - 1} c LEFT JOIN means$i m ON c.cent_id = m.cell)""".stripMargin
    }.mkString(",\n")
    s"""cents0 AS (SELECT vec_id AS cent_id, v AS cv FROM e
       |  WHERE vec_id < ${Similarity.NCentroids}),
       |$iterCtes,
       |assignF AS (
       |  SELECT vec_id, v, cell FROM (
       |    SELECT e.vec_id, e.v, c.cent_id AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY round(${sqlKmDot("e.v", "c.cv")} / (${norm("e.v")} * ${norm("c.cv")}), 6) DESC,
       |          c.cent_id ASC) AS rn
       |    FROM e CROSS JOIN $cf c) WHERE rn = 1)""".stripMargin
  }

  /** The full k-means oracle prelude (corpus/query prep + the Lloyd
    * training chain, ending in the `assignF` per-vector cell CTE and
    * the final-centroid CTE named [[sqlCentsFinal]]) — shared with
    * d12's semantic-dedup oracle, which clusters with the same stored
    * index the s04/s05/s07 family resolves. */
  private[queries] def sqlKmeansPrelude: String = s"$sqlPrep,\n$sqlKmeansChain"

  /** [[sqlKmeansChain]] parameterized by source CTE, name prefix, and
    * codebook size (a SQL expression, so an adaptive count can resolve
    * from a scalar subquery) — one instance per PQ subspace, plus
    * d12's adaptive-cell prelude. Ends with `${pfx}cents$iters` and
    * `${pfx}assignF`. */
  private def sqlKmeansChainFor(src: String, pfx: String,
      n: String, iters: Int): String = {
    // Per-vector argmax WITHOUT a window: the ROW_NUMBER form sorts
    // the full n·k scored cross join (each row dragging the vector
    // list along for the partition sort) — at sf10's 200k × 4096
    // adaptive cells that is 800M list-bearing rows per Lloyd round,
    // which DuckDB spilled past ~73 GB of temp disk before dying
    // (SCALE.md round-16: the one failed oracle cell). Folding
    // (score DESC, cent_id ASC) into ONE integer sort key and taking
    // MIN() turns each round into a streaming hash aggregate over
    // 200k groups — O(n) memory, zero spill, pairs consumed as the
    // cross join produces them. The key is exact: scores carry 6
    // decimals, so (1 - s)·10⁶ is integer-valued (±fp noise ROUND
    // removes) and distinct scores stay distinct; · 10⁵ + cent_id
    // tie-breaks ascending (cent_id < 10⁵ at every corpus dial —
    // 4096 adaptive cells at sf10, 256 PQ codes). Bit-identical
    // assignments to the window form wherever both complete
    // (selfcheck sf0.01/sf1 re-certifies the equivalence).
    def argmaxAssign(centsCte: String, outCte: String): String = {
      val s = s"round(${sqlKmDot("e.v", "c.cv")} / (${norm("e.v")} * ${norm("c.cv")}), 6)"
      s"""${outCte}_bk AS (
         |  SELECT e.vec_id,
         |    MIN(CAST(ROUND((1 - $s) * 1000000) AS BIGINT) * 100000 + c.cent_id) AS bk
         |  FROM $src e CROSS JOIN $centsCte c GROUP BY e.vec_id),
         |$outCte AS (
         |  SELECT e.vec_id, e.v, b.bk % 100000 AS cell
         |  FROM $src e JOIN ${outCte}_bk b ON e.vec_id = b.vec_id)""".stripMargin
    }
    val iterCtes = (1 to iters).map { i =>
      val prev = s"${pfx}cents${i - 1}"
      s"""${argmaxAssign(prev, s"${pfx}assign$i")},
         |${pfx}sums$i AS (
         |  SELECT cell, pos, CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS m
         |  FROM (SELECT cell, unnest(v) AS x, unnest(range(1, len(v) + 1)) AS pos FROM ${pfx}assign$i)
         |  GROUP BY cell, pos),
         |${pfx}means$i AS (SELECT cell, list(m ORDER BY pos) AS new_cv FROM ${pfx}sums$i GROUP BY cell),
         |${pfx}cents$i AS (
         |  SELECT c.cent_id, coalesce(m.new_cv, c.cv) AS cv
         |  FROM ${pfx}cents${i - 1} c LEFT JOIN ${pfx}means$i m ON c.cent_id = m.cell)""".stripMargin
    }.mkString(",\n")
    s"""${pfx}cents0 AS (SELECT vec_id AS cent_id, v AS cv FROM $src
       |  WHERE vec_id < $n),
       |$iterCtes,
       |${argmaxAssign(s"${pfx}cents$iters", s"${pfx}assignF")}""".stripMargin
  }

  /** d12's k-means prelude at the ADAPTIVE cell count
    * ([[graft.operators.Similarity.adaptiveCells]], mirrored as an
    * integer CASE chain over COUNT(*)): same Lloyd replay, init bound
    * resolved from the corpus size — at the oracle-checked test scales
    * (≤ [[graft.operators.Similarity.SemCellTarget]] · 16 vectors) it
    * resolves to the same 16 cells the s04 index trains, so the replay
    * is value-identical there; at bench scale the cell count grows
    * with the corpus, which is what keeps Σ|cell|² linear. Ends with
    * `sd_assignF`. */
  private[queries] def sqlSemDedupPrelude: String =
    s"""$sqlPrep,
       |kcells AS (SELECT ${Ops.sqlAdaptiveCells("COUNT(*)")} AS k FROM embeddings),
       |${sqlKmeansChainFor("e", "sd_", "(SELECT k FROM kcells)", Similarity.KmeansIters)}""".stripMargin

  /** s09 oracle: unit-normalize, replay one decimal-exact Lloyd chain
    * per subspace, encode, ADC via 6-dp-rounded decimal-summed dot
    * tables, shortlist, exact re-rank — term-for-term the Spark plan. */
  private def sqlPqOracle: String = {
    import graft.operators.Similarity.{PqSubspaces, PqCodebook, PqShortlist, KmeansIters, K}
    val sub = 64 / PqSubspaces // fixture embedding dim; the Spark side derives it
    val subspaces = (0 until PqSubspaces).map { m =>
      val lo = m * sub + 1
      val hi = m * sub + sub
      s"""sm$m AS (SELECT vec_id, u[$lo:$hi] AS v FROM u),
         |${sqlKmeansChainFor(s"sm$m", s"m${m}_", s"$PqCodebook", KmeansIters)}""".stripMargin
    }.mkString(",\n")
    val terms = (0 until PqSubspaces).map { m =>
      val lo = m * sub + 1
      val hi = m * sub + sub
      s"""SELECT q.query_id, a.vec_id,
         |  round(${sqlKmDot(s"q.qu[$lo:$hi]", "c.cv")}, 6) AS t
         |FROM m${m}_assignF a
         |JOIN m${m}_cents$KmeansIters c ON a.cell = c.cent_id
         |CROSS JOIN qn q""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |u AS (SELECT vec_id, list_transform(v, x -> x / ${norm("v")}) AS u FROM e),
       |qn AS (SELECT vec_id AS query_id, u AS qu FROM u WHERE vec_id < $NQueries),
       |$subspaces,
       |terms AS (
       |$terms),
       |adc AS (
       |  SELECT query_id, vec_id,
       |    CAST(SUM(CAST(t AS DECIMAL(28,6))) AS DOUBLE) AS adc
       |  FROM terms WHERE vec_id <> query_id GROUP BY 1, 2),
       |short AS (SELECT query_id, vec_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY adc DESC, vec_id ASC) AS srank FROM adc)
       |  WHERE srank <= $PqShortlist),
       |rer AS (
       |  SELECT s.query_id, s.vec_id,
       |    round(${sqlKmDot("qe.v", "ce.v")} / (${norm("qe.v")} * ${norm("ce.v")}), 6) AS cos
       |  FROM short s
       |  JOIN e ce ON ce.vec_id = s.vec_id
       |  JOIN e qe ON qe.vec_id = s.query_id)
       |SELECT query_id, vec_id, cos, rank FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank FROM rer)
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin
  }
  private[queries] def sqlCentsFinal: String = cf

  /** k-means IVF search oracle, parameterized on probe count — shared
    * by s04 (operator default [[Similarity.NProbe]]) and the default
    * ANN SQL surface (x06 at [[Similarity.DefaultAnnProbe]]). */
  def kmeansSearchOracle(nProbe: Int, labelFilter: Option[Int] = None): String = {
    val dotQC = sqlKmDot("q.qv", "c.cv")
    val dotAC = sqlKmDot("q.qv", "a.v")
    // s10's metadata filter: restrict candidates to the qualifying
    // label — the assignment chain is label-agnostic (the index is
    // global), so the filter joins back to the base table
    val flt = labelFilter
      .map(l => s"JOIN embeddings emb ON emb.vec_id = a.vec_id AND emb.label = $l\n  ")
      .getOrElse("")
    s"""WITH $sqlPrep,
       |$sqlKmeansChain,
       |probes AS (
       |  SELECT query_id, qv, cell FROM (
       |    SELECT q.query_id, q.qv, c.cent_id AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id
       |        ORDER BY round($dotQC / (${norm("q.qv")} * ${norm("c.cv")}), 6) DESC, c.cent_id ASC) AS rn
       |    FROM q CROSS JOIN $cf c) WHERE rn <= $nProbe),
       |scored AS (
       |  SELECT q.query_id, a.vec_id,
       |    round($dotAC / (${norm("q.qv")} * ${norm("a.v")}), 6) AS cos
       |  FROM assignF a ${flt}JOIN probes q
       |    ON a.cell = q.cell AND a.vec_id <> q.query_id)
       |SELECT query_id, vec_id, cos, rank FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER
       |    (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
       |  FROM scored)
       |WHERE rank <= ${Similarity.K}
       |ORDER BY query_id, rank""".stripMargin
  }

  val defs: Map[String, Q] = Map(
    // Embedding-math fan-outs (round 17): per-row vector arithmetic
    // (dot products, sign hashes, int8 scoring) above a serial
    // single-file scan is the strongest fanScan shape measured — ABBA
    // A/B at sf0.1: s06 0.57 -> 0.25 s, d05 0.53 -> 0.30 s, every
    // interleaved pair faster. Applied to the raw-embeddings operators
    // (s01/s02/s03/s05/s06, d05); the query-side frames stay broadcast.

    // #23 exact brute-force cosine top-k (query side broadcast)
    "s01_topk_cosine" -> ((s, dir) => {
      val e = fanScan(t(s, dir, "embeddings"))
      Similarity.bruteForceTopK(e, Similarity.defaultQueries(e, NQueries))
        .orderSmall("query_id", "rank")
    }),

    // #24 LSH-bucketed approximate top-k (equi-join on sign bucket)
    "s02_ann_lsh" -> ((s, dir) => {
      val e = fanScan(t(s, dir, "embeddings"))
      Similarity.annTopK(e, Similarity.defaultQueries(e, NQueries))
        .orderSmall("query_id", "rank")
    }),

    // s03 IVF-style ANN: data-adaptive cells + nProbe probing (map-side
    // cell assignment; candidate join is an equi-join on the cell id)
    "s03_ann_ivf" -> ((s, dir) => {
      val e = fanScan(t(s, dir, "embeddings"))
      Similarity.ivfTopK(e, Similarity.defaultQueries(e, NQueries))
        .orderSmall("query_id", "rank")
    }),

    // s04 IVF ANN with k-means-TRAINED centroids (Lloyd iterations as
    // DataFrame aggregations; deterministic init + decimal-exact means
    // make even the training loop oracle-reproducible). The centroids
    // come from the STORED index (round-8): training runs once per
    // corpus and commits; the search plans over the committed files.
    // The oracle still replays the full training chain — stored vs
    // retrained centroids must be value-identical or the hash fails.
    "s04_ann_kmeans" -> ((s, dir) => {
      implicit val spark = s
      val e = t(s, dir, "embeddings")
      Similarity.ivfTopKWith(Similarity.preparedCorpus(fanScan(e)),
          Similarity.storedKmeansCentroids(e, annIndexPath(dir)),
          Similarity.defaultQueries(e, NQueries))
        .orderSmall("query_id", "rank")
    }),

    // s05: corpus cartography over the trained k-means cells — cluster
    // sizes (the input to cluster-balanced sampling) and mean
    // cosine-to-centroid cohesion (flags incoherent regions); same
    // stored index as s04
    "s05_cluster_stats" -> ((s, dir) => {
      implicit val spark = s
      val e = t(s, dir, "embeddings")
      val ef = fanScan(e)
      Similarity.clusterStatsWith(ef,
        Similarity.storedKmeansCentroids(e, annIndexPath(dir))).orderBy("cell")
    }),

    // s06: int8-quantized brute-force top-k (§2 #34) — the 4×-smaller
    // vector representation a 10⁹-vector scan runs on; integer-exact
    // arithmetic keeps the whole quantize→score chain oracle-matched
    "s06_ann_quantized" -> ((s, dir) =>
      Similarity.quantizedTopK(fanScan(t(s, dir, "embeddings")), nQueries = NQueries)
        .orderSmall("query_id", "rank")),

    // s07: incremental admission (§2 #36) — a simulated arrival batch
    // (every 10th vector) assigned to the STORED index map-side:
    // O(batch) work, the index and history corpus never rescanned —
    // d09's continuous-ingest discipline applied to ANN
    "s07_ann_admit" -> ((s, dir) => {
      implicit val spark = s
      import org.apache.spark.sql.functions.col
      val e = t(s, dir, "embeddings")
      Similarity.admitBatch(e.filter(col("vec_id") % 10 === 7),
          Similarity.storedKmeansCentroids(e, annIndexPath(dir)))
        .orderBy("vec_id")
    }),

    // s09: product-quantized ANN + exact re-rank (§2 #45) — per-
    // subspace trained codebooks, ADC shortlist, full-precision math
    // only on the shortlist; the 32-bit-per-vector memory recipe.
    // Served from the STORED index (codebooks + encoded corpus —
    // training once per corpus; the oracle replays it, so stored vs
    // fresh must stay value-identical or the hash fails)
    "s09_ann_pq" -> ((s, dir) => {
      implicit val spark = s
      val e = t(s, dir, "embeddings")
      val (cbPath, codesPath) = pqIndexPaths(dir)
      val (cbs, codes) = Similarity.storedPqIndex(e, cbPath, codesPath)
      Similarity.pqTopKWith(e, cbs, codes, nQueries = NQueries)
        .orderSmall("query_id", "rank")
    }),

    // s10: FILTERED vector search — IVF ANN over the SAME stored
    // global index, with a metadata predicate (label) restricting the
    // candidate set. The filter applies to the corpus side BEFORE cell
    // assignment, so it pushes down to the embeddings scan
    // (spec-asserted PushedFilters) and the probe join only ever sees
    // qualifying vectors — the vector-DB "filtered search" shape where
    // selectivity shrinks work instead of post-filtering results away.
    // The index stays the unfiltered global one: filters change per
    // query, indexes do not.
    "s10_ann_filtered" -> ((s, dir) => {
      implicit val spark = s
      import org.apache.spark.sql.functions.col
      val e = t(s, dir, "embeddings")
      Similarity.ivfTopKWith(
        Similarity.preparedCorpus(fanScan(e.filter(col("label") === FilteredLabel))),
        Similarity.storedKmeansCentroids(e, annIndexPath(dir)),
        Similarity.defaultQueries(e, NQueries),
        nProbe = FilteredNProbe)
        .orderSmall("query_id", "rank")
    }),

    // s08: hybrid lexical+vector retrieval with reciprocal-rank fusion
    // (§2 #42) — BM25's top pool (t12, the fixed query-term set) fused
    // with the cosine top pool around an anchor embedding (doc 0) by
    // RRF: score = Σ 1/(60+rank), the rank-only fusion that needs no
    // score calibration between the two retrievers (Cormack et al.).
    // Scale shape: both arms are the already-proven top-k plans
    // (vocabulary-sized shuffles + WindowGroupLimit; broadcast query
    // side); the fusion join and the global re-rank touch only the two
    // top-k pools — 2k rows however large the corpus — so the
    // unpartitioned rank window over the lexical pool is bounded by
    // construction, never corpus-sized.
    "s08_hybrid_rrf" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val wl = Window.orderBy(col("score").desc, col("doc_id").asc)
      val lex = TextQueries.defs("t12_bm25")(s, dir)
        .select(col("doc_id"), row_number().over(wl).cast("int").as("r_lex"))
      val e = t(s, dir, "embeddings")
      val vec = Similarity
        .bruteForceTopK(e, Similarity.defaultQueries(e, 1), RrfPool)
        .select(col("vec_id").as("doc_id"), col("rank").cast("int").as("r_vec"))
      lex.join(vec, Seq("doc_id"), "full_outer")
        .withColumn("rrf", round(
          coalesce(lit(1.0) / (lit(60.0) + col("r_lex").cast("double")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60.0) + col("r_vec").cast("double")), lit(0.0)),
          6))
        .select(col("doc_id"), col("r_lex"), col("r_vec"), col("rrf"))
        .orderBy(col("rrf").desc, col("doc_id").asc)
        .limit(RrfPool)
    }))

  /** s08 pool width: each retrieval arm contributes its top-RrfPool
    * ranks, and the fused report keeps RrfPool rows (matches t12's
    * Bm25TopK so the lexical arm is exactly the t12 result). */
  val RrfPool: Int = TextQueries.Bm25TopK

  val oracles: Map[String, String] = Map(
    "s01_topk_cosine" ->
      s"""WITH $sqlPrep,
         |scored AS (
         |  SELECT q.query_id, c.vec_id,
         |    round($sqlDot / ($sqlQNorm * $sqlCNorm), 6) AS cos
         |  FROM e c CROSS JOIN q WHERE c.vec_id <> q.query_id)
         |SELECT query_id, vec_id, cos, rank FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER
         |    (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
         |  FROM scored)
         |WHERE rank <= ${Similarity.K}
         |ORDER BY query_id, rank""".stripMargin,

    "s03_ann_ivf" -> {
      val dotEC = Ops.sqlListDot("e.v", "c.cv")
      val dotQC = Ops.sqlListDot("q.qv", "c.cv")
      val eNorm = Ops.sqlListNorm("e.v")
      val qNorm = Ops.sqlListNorm("q.qv")
      val cNorm = Ops.sqlListNorm("c.cv")
      val dotAC = Ops.sqlListDot("q.qv", "a.v")
      val aNorm = Ops.sqlListNorm("a.v")
      s"""WITH $sqlPrep,
         |cents AS (SELECT vec_id AS cent_id, v AS cv FROM e
         |  WHERE vec_id < ${Similarity.NCentroids}),
         |assigned AS (
         |  SELECT vec_id, v, cell FROM (
         |    SELECT e.vec_id, e.v, c.cent_id AS cell,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY round($dotEC / ($eNorm * $cNorm), 6) DESC, c.cent_id ASC) AS rn
         |    FROM e CROSS JOIN cents c) WHERE rn = 1),
         |probes AS (
         |  SELECT query_id, qv, cell FROM (
         |    SELECT q.query_id, q.qv, c.cent_id AS cell,
         |      ROW_NUMBER() OVER (PARTITION BY q.query_id
         |        ORDER BY round($dotQC / ($qNorm * $cNorm), 6) DESC, c.cent_id ASC) AS rn
         |    FROM q CROSS JOIN cents c) WHERE rn <= ${Similarity.NProbe}),
         |scored AS (
         |  SELECT q.query_id, a.vec_id,
         |    round($dotAC / ($qNorm * $aNorm), 6) AS cos
         |  FROM assigned a JOIN probes q
         |    ON a.cell = q.cell AND a.vec_id <> q.query_id)
         |SELECT query_id, vec_id, cos, rank FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER
         |    (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
         |  FROM scored)
         |WHERE rank <= ${Similarity.K}
         |ORDER BY query_id, rank""".stripMargin
    },

    "s04_ann_kmeans" -> kmeansSearchOracle(Similarity.NProbe),

    // s10: identical chain + the label restriction on the candidate
    // set, at the selectivity-widened probe count
    "s10_ann_filtered" ->
      kmeansSearchOracle(FilteredNProbe, labelFilter = Some(FilteredLabel)),

    // s06: replay the identical quantize→score arithmetic — integer
    // grid values are exact in doubles, so the 6-dp cosine compare
    // carries no quantization-specific float risk
    "s06_ann_quantized" -> {
      val qDot = Ops.sqlListDot("q.qv", "c.v")
      val qN = Ops.sqlListNorm("q.qv")
      val cN = Ops.sqlListNorm("c.v")
      s"""WITH e0 AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v0
         |  FROM embeddings),
         |qz AS (
         |  SELECT vec_id, list_transform(v0,
         |    x -> CAST(CAST(round(x * ${Similarity.QuantLevels} / amax) AS INTEGER) AS DOUBLE)) AS v
         |  FROM (SELECT vec_id, v0,
         |          list_max(list_transform(v0, x -> abs(x))) AS amax
         |        FROM e0)
         |  WHERE amax > 0),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM qz WHERE vec_id < $NQueries),
         |scored AS (
         |  SELECT q.query_id, c.vec_id,
         |    round($qDot / ($qN * $cN), 6) AS cos
         |  FROM qz c CROSS JOIN q WHERE c.vec_id <> q.query_id)
         |SELECT query_id, vec_id, cos, rank FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER
         |    (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
         |  FROM scored)
         |WHERE rank <= ${Similarity.K}
         |ORDER BY query_id, rank""".stripMargin
    },

    "s05_cluster_stats" ->
      s"""WITH $sqlPrep,
         |$sqlKmeansChain,
         |coh AS (
         |  SELECT a.cell,
         |    round(${sqlKmDot("a.v", "c.cv")} / (${norm("a.v")} * ${norm("c.cv")}), 6) AS ccos
         |  FROM assignF a JOIN $cf c ON a.cell = c.cent_id)
         |SELECT cell, COUNT(*) AS n_vectors,
         |  CAST(SUM(CAST(ccos AS DECIMAL(28,6))) AS DOUBLE) / COUNT(ccos) AS mean_cos
         |FROM coh GROUP BY cell ORDER BY cell""".stripMargin,

    // s07: the oracle's assignF covers ALL vectors; restricting it to
    // the batch ids reproduces what map-side admission of just the
    // batch must compute (assignment is per-vector independent)
    "s07_ann_admit" ->
      s"""WITH $sqlPrep,
         |$sqlKmeansChain,
         |b AS (SELECT vec_id, v, cell FROM assignF WHERE vec_id % 10 = 7)
         |SELECT b.vec_id, b.cell,
         |  round(${sqlKmDot("b.v", "c.cv")} / (${norm("b.v")} * ${norm("c.cv")}), 6) AS ccos
         |FROM b JOIN $cf c ON b.cell = c.cent_id
         |ORDER BY b.vec_id""".stripMargin,

    "s02_ann_lsh" ->
      s"""WITH $sqlPrep,
         |qb AS (SELECT query_id, qv, ${Ops.sqlSignBucket("qv", Dedup.SignBits)} AS qbucket FROM q),
         |cb AS (SELECT vec_id, v, ${Ops.sqlSignBucket("v", Dedup.SignBits)} AS bucket FROM e),
         |scored AS (
         |  SELECT q.query_id, c.vec_id,
         |    round($sqlDot / ($sqlQNorm * $sqlCNorm), 6) AS cos
         |  FROM cb c JOIN qb q ON c.bucket = q.qbucket AND c.vec_id <> q.query_id)
         |SELECT query_id, vec_id, cos, rank FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER
         |    (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
         |  FROM scored)
         |WHERE rank <= ${Similarity.K}
         |ORDER BY query_id, rank""".stripMargin,

    "s09_ann_pq" -> sqlPqOracle,

    // s08: the lexical arm embeds t12's oracle verbatim (rank = its
    // already-deterministic output order); the vector arm is s01's
    // brute-force scoring for the single anchor query; fusion is pure
    // rank arithmetic in doubles, identical in both engines
    "s08_hybrid_rrf" ->
      s"""WITH lex AS (
         |  SELECT doc_id, CAST(ROW_NUMBER() OVER
         |      (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS r_lex
         |  FROM (${TextQueries.oracles("t12_bm25")}) tl),
         |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |anchor AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         |vscore AS (
         |  SELECT e.vec_id,
         |    round(${Ops.sqlListDot("a.qv", "e.v")} /
         |      (${Ops.sqlListNorm("a.qv")} * ${Ops.sqlListNorm("e.v")}), 6) AS cos
         |  FROM e CROSS JOIN anchor a WHERE e.vec_id <> 0),
         |vec AS (SELECT vec_id AS doc_id, r_vec FROM (
         |    SELECT vec_id, CAST(ROW_NUMBER() OVER
         |        (ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS r_vec
         |    FROM vscore)
         |  WHERE r_vec <= $RrfPool),
         |fused AS (
         |  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id, l.r_lex, v.r_vec,
         |    round(coalesce(1.0 / (60.0 + CAST(l.r_lex AS DOUBLE)), 0.0) +
         |      coalesce(1.0 / (60.0 + CAST(v.r_vec AS DOUBLE)), 0.0), 6) AS rrf
         |  FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id)
         |SELECT doc_id, r_lex, r_vec, rrf FROM fused
         |ORDER BY rrf DESC, doc_id LIMIT $RrfPool""".stripMargin)
}
