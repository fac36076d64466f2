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
      nCentroids: Int = NCentroids, nProbe: Int = NProbe): DataFrame = {
    val corpus = prepared(embeddings)
    val cents = corpus.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("norm").as("cnorm"))
    def cellCos(vec: Column, norm: Column, c: Column) =
      round(Dedup.dot(vec, c.getField("cv")) / (norm * c.getField("cnorm")), 6)
    // all centroids as ONE broadcast row (sorted for a deterministic fold)
    val centArr = cents.agg(sort_array(collect_list(
      struct(col("cent_id"), col("cv"), col("cnorm")))).as("cents"))
    val assigned = corpus.crossJoin(broadcast(centArr))
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

  /** The driver-contract query set: the first `n` vectors by id act as
    * queries against the full corpus. */
  def defaultQueries(embeddings: DataFrame, n: Int = 5): DataFrame =
    prepared(embeddings)
      .filter(col("vec_id") < n)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"))
}
