package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** SemDeDup cluster-count dial measurement (SCALE.md round 8): d12's
  * pairwise work is Σ|cell|², so at a FIXED nCentroids the per-cell
  * population — and the candidate-pair count — grows quadratically
  * with the corpus. The published recipe scales the cluster count
  * with the corpus instead (nCentroids ≈ n / target_cell_size); this
  * probe times semanticDedup at increasing nCentroids on one corpus
  * to show the dial flattening the cost, and reports the kept-set
  * size so the semantic effect of finer cells is visible too (a pair
  * only counts as duplicate when it shares a cell).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=… sbt "runMain graft.SemDedupProbe [k ...]"`
  * (default cluster counts 16/64/256 — pass larger ks for larger
  * corpora, holding n/k ≈ the target cell size). Rows print as JSON
  * for SCALE.md.
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftEngine.session(GraftConfig(
      master = "local[32]", appName = "graft-semdedup-probe"))
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = embs.count()
    val ks = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(16, 64, 256)
    ks.foreach { k =>
      val t0 = System.nanoTime()
      val cents = Similarity.kmeansCentroids(embs, nCentroids = k)
      val labels = Dedup.semanticDedup(embs, cents)
      val kept = labels.filter(col("is_kept") === 1).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"vectors":$n,"nCentroids":$k,"sec":${
        String.format(java.util.Locale.ROOT, "%.2f", Double.box(sec))
      },"kept":$kept}""")
    }
    spark.stop()
  }
}
