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

  test("byte-walking token counter equals the regex forms on the corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val mismatch = docs.select(
      graft.functions.TokenCount.tokenCount(col("text"), "ws").as("ws_fast"),
      RegexpCount.regexpCount(trim(col("text")), "\\S+").as("ws_regex"),
      graft.functions.TokenCount.tokenCount(lower(col("text")), "bpe").as("bpe_fast"),
      RegexpCount.regexpCount(lower(col("text")), TextFunctions.BpePattern).as("bpe_regex"))
      .filter(col("ws_fast") =!= col("ws_regex") ||
        col("bpe_fast") =!= col("bpe_regex")).count()
    assert(mismatch == 0, "TokenCount diverged from the regex semantics on the corpus")
  }

  test("byte-walking token counter equals the regex forms on adversarial unicode") {
    import spark.implicits._
    // multibyte letters/marks, unicode whitespace (U+00A0 is \S under
    // Java's default flags), vertical tab, astral-plane emoji, digit
    // runs abutting letter runs, empties and all-whitespace
    val rows = Seq(
      "héllo wörld", "café 123abc", "a b", "xy",
      "—— dash", "😀 two 😀😀",
      "", "   \t\n ", "ABC def", "a1b2c3", "ё ж э 42", "tab\tsep\rret",
      "ends with space ", " starts", "İstanbul lowered").toDF("text")
    val mismatch = rows.select(
      graft.functions.TokenCount.tokenCount(col("text"), "ws").as("ws_fast"),
      RegexpCount.regexpCount(trim(col("text")), "\\S+").as("ws_regex"),
      graft.functions.TokenCount.tokenCount(lower(col("text")), "bpe").as("bpe_fast"),
      RegexpCount.regexpCount(lower(col("text")), TextFunctions.BpePattern).as("bpe_regex"))
      .filter(col("ws_fast") =!= col("ws_regex") ||
        col("bpe_fast") =!= col("bpe_regex")).count()
    assert(mismatch == 0, "TokenCount diverged from the regex semantics on planted unicode")
  }

  test("graft_token_count is callable from SQL, stays in codegen, rejects bad modes") {
    assert(spark.sql("SELECT graft_token_count(' a1 b2  c3 ', 'ws') AS c")
      .head().getInt(0) == 3)
    assert(spark.sql("SELECT graft_token_count('a1 b2  c3!', 'bpe') AS c")
      .head().getInt(0) == 7)
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(graft.functions.TokenCount.tokenCount(col("text"), "ws").as("c"))
    val code = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    assert(code.contains("TokenCount.count"), "byte walk not inlined in generated code")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_token_count('x', 'words')").collect()
    }
    assert(e.getMessage.contains("mode"))
    // CAST(NULL AS STRING) is foldable and string-typed but folds to
    // null — must hit the same clean mode error, not an NPE.
    val en = intercept[Exception] {
      spark.sql("SELECT graft_token_count('x', CAST(NULL AS STRING))").collect()
    }
    assert(en.getMessage.contains("mode"), s"got: ${en.getMessage}")
  }
}
