package graft

import graft.functions.{RegexpCount, TextFunctions}
import org.apache.spark.sql.functions._

class RegexpCountSpec extends SparkSpec {

  test("native match counter equals size(regexp_extract_all) on the corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cases = Seq(
      ("ws", trim(col("text")), "\\S+"),
      ("bpe", lower(col("text")), TextFunctions.BpePattern))
    cases.foreach { case (name, input, pat) =>
      val mismatch = docs.select(
        RegexpCount.regexpCount(input, pat).as("native"),
        size(regexp_extract_all(input, lit(pat), lit(0))).as("composed"))
        .filter(col("native") =!= col("composed")).count()
      assert(mismatch == 0, s"mismatch for $name")
    }
  }

  test("graft_regexp_count is callable from SQL and needs a literal pattern") {
    val n = spark.sql(
      "SELECT graft_regexp_count('a1 b2  c3', '[a-z][0-9]') AS c").head().getInt(0)
    assert(n == 3)
    val zero = spark.sql(
      "SELECT graft_regexp_count('', '\\\\S+') AS c").head().getInt(0)
    assert(zero == 0)
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_regexp_count('x', CAST(rand() AS STRING))").collect()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("native counter stays inside whole-stage codegen") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(RegexpCount.regexpCount(col("text"), "\\S+").as("c"))
    val code = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    assert(code.contains("find()"), "matcher loop not inlined in generated code")
  }
}
