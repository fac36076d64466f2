package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale smoke: runs the heavy pipeline operators on a 20× replication
  * of the sf0.1 corpus (100k docs / 40k vectors) to measure how runtime
  * grows with input — the local stand-in for the 100 TB question.
  *
  * The replicated corpus is realistic for dedup: half the clones are
  * salted (unique texts), half are kept verbatim (10-way exact/near
  * duplicates), so bucket populations and pair counts grow the way a
  * crawled corpus's would, not degenerately.
  *
  * Usage: `sbt "runMain graft.ScaleSmoke [factor]"` (default 20).
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftEngine.session(GraftConfig(master = "local[32]", appName = "graft-scale"))

    def replicate(df: DataFrame, idCol: String, textCol: Option[String]): DataFrame =
      (0 until factor).map { i =>
        val shifted = df.withColumn(idCol, col(idCol) + lit(i * 10000000L))
        textCol match {
          // salt odd replicas → unique docs; even replicas stay verbatim
          // → (factor/2)-way duplicate groups
          case Some(t) if i % 2 == 1 =>
            shifted.withColumn(t, concat(lit(s"salt$i "), col(t)))
          case _ => shifted
        }
      }.reduce(_ unionAll _)

    val docs = replicate(spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", Some("text"))
    val embs = replicate(spark.read.parquet(s"$sfDir/embeddings.parquet"), "vec_id", None)

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"op":"$name","rows":$n,"sec":$sec%.2f}""")
    }

    println(s"""{"factor":$factor,"docs":${docs.count()},"vectors":${embs.count()}}""")
    time("d01_exact")(operators.Dedup.exact(docs))
    time("d02_minhash_candidates")(operators.Dedup.minhashCandidates(docs))
    time("d03_simhash_pairs")(operators.Dedup.simhashPairs(docs))
    time("d05_embcos_pairs")(operators.Dedup.embeddingCosinePairs(embs, signBits = 8))
    time("d06_clusters")(operators.Dedup.clusters(docs))
    time("d08_block_overlap")(operators.Dedup.blockOverlapPairs(docs))
    time("d10_substring_pairs")(operators.Dedup.substringSpanPairs(docs))
    time("s01_topk")(operators.Similarity.bruteForceTopK(embs, operators.Similarity.defaultQueries(embs)))
    time("s03_ivf_topk")(operators.Similarity.ivfTopK(embs, operators.Similarity.defaultQueries(embs)))
    // d09: admit the odd half as a new batch against the even half's
    // stored band index — the continuous-ingest shape
    time("d09_incremental_keep")(operators.Dedup.incrementalKeep(
      operators.Dedup.bandedBuckets(docs.filter(col("doc_id") % 2 === 0)),
      docs.filter(col("doc_id") % 2 === 1)))
    // p05: shard packing via the blocked prefix sum
    time("p05_pack_shards")(operators.Splits.packShards(
      docs.select(col("doc_id"), col("text")), col("doc_id"),
      graft.functions.TextFunctions.wsTokenCount(col("text")),
      budget = 5000L, blockSize = 10000L))
    spark.stop()
  }
}
