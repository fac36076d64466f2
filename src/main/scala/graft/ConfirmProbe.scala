package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev measurement tool: dissect the d04/d16 confirm-stage cost into
  * its pieces (candidate probe, shingle-set resolution, confirm joins,
  * exact intersection) so perf work targets the measured bottleneck
  * instead of the assumed one. Round-14 origin: the stored shingle-set
  * artifact removed both corpus re-shingling passes from the confirm
  * plan and the sf1 time DIDN'T MOVE — this probe is how we found the
  * real cost (see PLANS.md d04 section for the verdict).
  */
object ConfirmProbe {
  private def time(label: String)(body: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = body
    println(f"[confirm-probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (rows=$n)")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata-sf1/sf1")
    implicit val spark = GraftEngine.session(GraftConfig(
      master = "local[32]", appName = "graft-confirm-probe", shufflePartitions = 32))
    import graft.operators.Dedup
    import graft.queries.DedupQueries._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def run(label: String, df: DataFrame): Unit = time(label) { df.count() }

    val cands = Dedup.minhashCandidatesStored(docs, bandIndexPath(sfDir))
    run("candidates (stored band index)", cands)
    run("candidates again (warm)", cands)

    val stored = Dedup.storedShingleSets(docs, shingleSetsPath(sfDir))
    run("stored shingle sets full scan", stored.select(sum(size(col("shingles")))))
    run("in-session shingleSets full scan", Dedup.shingleSets(docs).select(sum(size(col("shingles")))))

    // the confirm joins WITHOUT the intersect (candidate rows with both
    // arrays attached, reduced to a count) — isolates join/shuffle cost
    val sh = stored
    val joined = cands
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sa")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sb")), "doc_b")
    run("confirm joins only (stored sets)", joined.select(count(lit(1))))

    run("d04 full (stored sets)", Dedup.jaccardPairsFromSets(stored, cands))
    run("d04 full (in-session sets)", Dedup.jaccardPairsFrom(docs, cands))
    run("d16 full (stored sets)", Dedup.containmentPairsFromSets(stored, cands))

    println(Dedup.jaccardPairsFromSets(stored, cands).queryExecution.executedPlan.toString())
    spark.stop()
  }
}
