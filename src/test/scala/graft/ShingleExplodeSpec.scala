package graft

import graft.functions.{ShingleExplode, TextFunctions}
import org.apache.spark.sql.functions._

class ShingleExplodeSpec extends SparkSpec {

  test("native generator emits exactly the distinct shingle set of the HOF pipeline") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val viaHof = docs.select(col("doc_id"),
      explode(array_distinct(TextFunctions.shingles(
        TextFunctions.words(col("text")), 3))).as("sh"))
    val viaGen = docs.select(col("doc_id"),
      ShingleExplode.shingleExplode(TextFunctions.words(col("text")), 3).as("sh"))
    assert(viaGen.count() == viaHof.count())
    assert(viaGen.exceptAll(viaHof).count() == 0)
    assert(viaHof.exceptAll(viaGen).count() == 0)
  }

  test("native shingle-set array equals array_distinct of the HOF pipeline, order included") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val w = TextFunctions.words(col("text"))
    val mismatch = docs.select(
      graft.functions.ShingleSet.shingleSet(w, 3).as("native"),
      array_distinct(TextFunctions.shingles(w, 3)).as("composed"))
      .filter(col("native") =!= col("composed")).count()
    assert(mismatch == 0)
  }

  test("documents shorter than k words emit one whole-text shingle") {
    import spark.implicits._
    val df = Seq((1L, "just two")).toDF("doc_id", "text")
    val rows = df.select(col("doc_id"),
      ShingleExplode.shingleExplode(TextFunctions.words(col("text")), 3).as("sh"))
      .collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("just two"))
  }

  test("graft_shingles is callable from SQL with a literal k") {
    val n = spark.sql(
      "SELECT graft_shingles(array('a','b','c','d'), 2) AS sh").count()
    assert(n == 3)
    val dup = spark.sql(
      "SELECT graft_shingles(array('x','x','x'), 2) AS sh").count()
    assert(dup == 1) // 'x x' deduped
  }

  test("non-literal k is rejected") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingles(array('a','b'), cast(rand()*2 AS INT) + 1)").collect()
    }
    assert(e.getMessage.contains("literal"))
  }
}
