package graft

import graft.operators.Similarity

/** s09 product quantization: recall floor against the exact ground
  * truth at the committed (M=8, k=16, R=150) setting, and the plan
  * shape that makes PQ the memory-side recipe — broadcast codebooks
  * and dot tables, WindowGroupLimit top-k, no cartesian anywhere.
  * Runs on the 500-vector sf0.01 corpus (sf0.001 is smaller than the
  * shortlist, which would make the recall check vacuous). */
class PqAnnSpec extends SparkSpec {

  private def embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

  test("s09 PQ shortlist + exact re-rank: recall@10 >= 0.9 vs s01 ground truth") {
    val e = embs
    val exact = Similarity.bruteForceTopK(e, Similarity.defaultQueries(e))
    val pq = Similarity.pqTopK(e)
    val r = Similarity.recallAtK(pq, exact)
    assert(r >= 0.9, f"PQ+rerank recall@10 = $r%.3f < 0.9")
  }

  test("s09 plan: top-k is WindowGroupLimit, no cartesian product") {
    val plan = Similarity.pqTopK(embs).queryExecution.executedPlan.toString()
    assert(plan.contains("WindowGroupLimit"),
      s"final top-k must pre-trim per task:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian in the PQ path:\n$plan")
  }

  test("s09 output contract: k ranked rows per query, ranks contiguous") {
    val rows = Similarity.pqTopK(embs).collect()
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      assert(ranks.sameElements(1 to rs.length), s"query $q ranks not contiguous")
      assert(rs.length == Similarity.K, s"query $q returned ${rs.length} rows")
      assert(rs.forall(_.getAs[Long]("vec_id") != q), "self-match leaked")
    }
  }
}
