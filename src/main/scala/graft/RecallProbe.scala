package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** ANN recall measurement (round-3 verdict item 2): recall@10 vs the
  * s01 brute-force ground truth for every approximate search path, at
  * realistic probe counts, on a replicated corpus.
  *
  *  - s02 sign-LSH: probes ∈ {1, 2, 4} (multiprobe bit flips)
  *  - s03 IVF (first-N centroids): nProbe ∈ {1, 4, 8}
  *  - s04 IVF (k-means-trained):   nProbe ∈ {1, 4, 8}
  *
  * The replication salts NOTHING (embeddings have no text) — clones are
  * verbatim, so each query's true neighbor list includes exact
  * duplicates at cosine 1.0; an ANN path only finds them if its bucket/
  * cell routing is consistent, which is exactly what recall should
  * measure. Rows print as JSON for SCALE.md.
  *
  * Usage: `sbt "runMain graft.RecallProbe [factor]"` (default 20).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftEngine.session(GraftConfig(master = "local[32]", appName = "graft-recall"))

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val embs =
      if (factor == 1) base
      else (0 until factor).map(i =>
        base.withColumn("vec_id", col("vec_id") + lit(i * 10000000L)))
        .reduce(_ unionAll _)
    val queries = Similarity.defaultQueries(embs).cache()
    println(s"""{"factor":$factor,"vectors":${embs.count()}}""")

    val truth = Similarity.bruteForceTopK(embs, queries).cache()
    truth.count() // materialize ground truth once

    def row(op: String, param: String, v: Int)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = Similarity.recallAtK(df, truth)
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"""{"op":"$op","$param":$v,"recall_at_10":${Bench.num(r, 3)},"sec":${Bench.num(sec, 2)}}""")
    }

    Seq(1, 2, 4).foreach(p =>
      row("s02_lsh", "probes", p)(Similarity.annTopK(embs, queries, probes = p)))
    Seq(1, 4, 8).foreach(p =>
      row("s03_ivf_firstN", "nProbe", p)(Similarity.ivfTopK(embs, queries, nProbe = p)))
    val trained = Similarity.kmeansCentroids(embs).cache()
    trained.count()
    Seq(1, 4, 8).foreach(p =>
      row("s04_ivf_kmeans", "nProbe", p)(Similarity.ivfTopKWith(
        Similarity.preparedCorpus(embs), trained, queries, nProbe = p)))
    spark.stop()
  }
}
