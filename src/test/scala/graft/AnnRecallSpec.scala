package graft

import graft.operators.Similarity

/** Recall floor for the DEFAULT ANN surface (round-4 verdict item 5).
  *
  * [[Similarity.annDefault]] (k-means IVF, DefaultAnnProbe probes) is
  * what `graft_ann_topk` / x06 serve; this pins recall@10 ≥ 0.9
  * against the s01 exact ground truth on the non-degenerate 500-vector
  * corpus, so the default surface cannot silently regress. The
  * measured value is deterministic (first-N init, decimal-exact
  * means, 6-dp tie-broken ranking): 0.96 on this corpus — 0.9 leaves
  * headroom for corpus regeneration, not for nondeterminism.
  *
  * Sign-LSH (s02) is deliberately NOT floor-pinned here as a search
  * surface: at 0.28-0.44 recall it is the candidate-generation
  * primitive (SimilaritySpec pins its own looser floor).
  */
class AnnRecallSpec extends SparkSpec {

  test("default ANN surface holds recall@10 >= 0.9 vs exact ground truth") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = Similarity.defaultQueries(embs)
    val truth = Similarity.bruteForceTopK(embs, queries)
    val approx = Similarity.annDefault(embs, queries)
    val recall = Similarity.recallAtK(approx, truth)
    assert(recall >= 0.9,
      f"default ANN surface recall@10 = $recall%.3f < 0.9")
  }
}
