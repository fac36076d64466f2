package graft

import graft.functions.{StopwordHits, TextFunctions}
import org.apache.spark.sql.functions._

class StopwordHitsSpec extends SparkSpec {

  test("native stopword counter equals the filter/isin composition on the corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    TextFunctions.Stopwords.foreach { case (lang, stop) =>
      val words = TextFunctions.words(col("text"))
      val mismatch = docs.select(
        StopwordHits.stopwordHits(words, stop).as("native"),
        size(filter(words, w => w.isInCollection(stop))).as("composed"))
        .filter(col("native") =!= col("composed")).count()
      assert(mismatch == 0, s"mismatch for $lang")
    }
  }

  test("graft_stopword_hits is callable from SQL and needs a literal set") {
    val n = spark.sql(
      "SELECT graft_stopword_hits(array('the','cat','sat','the'), array('the','a')) AS c")
      .head().getInt(0)
    assert(n == 2)
    val e = intercept[Exception] {
      spark.sql(
        """SELECT graft_stopword_hits(array('x'), array(CAST(rand() AS STRING)))"""
      ).collect()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("native counter stays inside whole-stage codegen") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(StopwordHits.stopwordHits(
        TextFunctions.words(col("text")),
        TextFunctions.Stopwords.head._2).as("c"))
    val code = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    assert(code.contains("contains"), "HashSet loop not inlined in generated code")
  }
}
