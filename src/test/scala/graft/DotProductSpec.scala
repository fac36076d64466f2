package graft

import graft.functions.DotProduct.dotp
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {

  test("graft_dot matches the higher-order-function fold bit-for-bit") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2, 0.3), Seq(-0.4, 0.5, 0.6)),
      (Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (p, q) => p * q),
      lit(0.0), (acc, v) => acc + v)
    assert(df.filter(dotp(col("a"), col("b")) =!= hof).count() == 0)
    assert(df.select(dotp(col("a"), col("b"))).head().getDouble(0) == 32.0)
  }

  test("graft_dot is registered as a SQL function via GraftExtensions") {
    val r = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(r == 11.0)
  }

  test("graft_dot participates in whole-stage codegen (no CodegenFallback)") {
    // parquet-backed input so the projection isn't constant-folded away
    val v = transform(col("embedding"), x => x.cast("double"))
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(dotp(v, v).as("d"))
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("*("), s"no codegen span:\n$plan")
    // generated code must contain the inlined loop, not a fallback call
    val code = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    assert(code.contains("numElements"), "native loop not inlined in generated code")
    assert(df.filter(col("d") <= 0).count() == 0)
  }

  test("graft_dot returns NULL on length mismatch or null elements, like the HOF form") {
    val mismatch = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d)) AS d").head()
    assert(mismatch.isNullAt(0), "length mismatch must be NULL, not a partial dot")
    val nullElem = spark.sql(
      "SELECT graft_dot(array(1.0d, CAST(NULL AS DOUBLE)), array(3.0d, 4.0d)) AS d").head()
    assert(nullElem.isNullAt(0), "null element must poison the sum")
  }

  test("graft_dot rejects non-double-array arguments") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot('a', 'b')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("graft_dot"))
  }
}
