package graft

import graft.operators.Dedup
import graft.functions.MinhashAgg
import org.apache.spark.sql.functions._

class MinhashAggSpec extends SparkSpec {

  test("native minhash aggregate equals 16 separate min(md5) aggregates") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val rows = Dedup.shingleRows(docs)
    val mins = (0 until Dedup.NumHashes).map(h =>
      min(md5(concat(lit(s"$h|"), col("sh")))).as(s"mh$h"))
    val reference = rows.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until Dedup.NumHashes).map(h => col(s"mh$h")): _*).as("sig"))
    val native = Dedup.minhashSignatures(docs)
    assert(native.exceptAll(reference).count() == 0)
    assert(reference.exceptAll(native).count() == 0)
  }

  test("graft_minhash from SQL: singleton group's signature is its own hashes") {
    val row = spark.sql(
      "SELECT graft_minhash(sh, 2) AS sig FROM (SELECT 'abc' AS sh)")
      .head().getSeq[String](0)
    val exp = (0 until 2).map(h =>
      spark.sql(s"SELECT md5('$h|abc')").head().getString(0))
    assert(row == exp)
  }

  test("partial-buffer merge across partitions matches single-partition result") {
    import spark.implicits._
    val shingles = (1 to 500).map(i => (1L, s"shingle $i")).toDF("id", "sh")
    val one = shingles.coalesce(1).groupBy("id")
      .agg(MinhashAgg.minhashAgg(col("sh"), 16)).head().getSeq[String](1)
    val many = shingles.repartition(8).groupBy("id")
      .agg(MinhashAgg.minhashAgg(col("sh"), 16)).head().getSeq[String](1)
    assert(one == many)
  }
}
