package graft

import graft.operators.Dedup
import graft.functions.SimhashAgg
import org.apache.spark.sql.functions._

class SimhashAggSpec extends SparkSpec {

  test("native simhash aggregate equals the 64-sum(CASE) formulation bit-for-bit") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val hashed = Dedup.shingleRows(docs)
      .select(col("doc_id"), md5(col("sh")).as("h"))
    // reference formulation: one sum(CASE) vote per bit
    val votes = (0 until 64).map { i =>
      val digit = i / 4 + 1
      val chars = Dedup.HexBitSet(3 - i % 4)
      sum(when(substring(col("h"), digit, 1).isInCollection(chars), 1).otherwise(-1))
        .as(s"v$i")
    }
    val reference = hashed.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        concat((0 until 64).map(i =>
          when(col(s"v$i") > 0, "1").otherwise("0")): _*).as("simhash"))
    val native = Dedup.simhashed(docs)
    assert(native.exceptAll(reference).count() == 0)
    assert(reference.exceptAll(native).count() == 0)
  }

  test("graft_simhash is callable from SQL and ties vote to '0'") {
    // a single feature 'ffff...' sets every bit: all votes +1 → all '1'
    val all1 = spark.sql(
      "SELECT graft_simhash(h) AS s FROM (SELECT repeat('f', 16) AS h)")
      .head().getString(0)
    assert(all1 == "1" * 64)
    // two features with complementary digits: votes 0 → bit '0' (tie)
    val tied = spark.sql(
      """SELECT graft_simhash(h) AS s FROM
        |(SELECT repeat('f', 16) AS h UNION ALL SELECT repeat('0', 16))""".stripMargin)
      .head().getString(0)
    assert(tied == "0" * 64)
  }

  test("NULL input rows vote -1 on every bit, matching the composed CASE form") {
    // one all-f hash (+1 every bit) + two NULLs (-1 each) → sum -1 → all '0';
    // the composed sum(CASE ... ELSE -1) form gives the same votes
    val s = spark.sql(
      """SELECT graft_simhash(h) AS s FROM
        |(SELECT repeat('f', 16) AS h
        | UNION ALL SELECT CAST(NULL AS STRING)
        | UNION ALL SELECT CAST(NULL AS STRING))""".stripMargin)
      .head().getString(0)
    assert(s == "0" * 64)
  }

  test("partial-buffer merge across many partitions matches single-partition result") {
    import spark.implicits._
    val features = (1 to 200).map(i => (1L, f"$i%032x")).toDF("id", "h")
    val one = features.coalesce(1).groupBy("id")
      .agg(SimhashAgg.simhashAgg(col("h"))).head().getString(1)
    val many = features.repartition(8).groupBy("id")
      .agg(SimhashAgg.simhashAgg(col("h"))).head().getString(1)
    assert(one == many)
  }
}
