package graft

import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("p01 training prep returns one row per surviving language with sane budgets") {
    val rows = PipelineQueries.defs("p01_training_prep")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") > 0)
      assert(r.getAs[Long]("total_tokens") >= r.getAs[Long]("total_words"))
    }
  }

  test("p01 is a three-shuffle plan: fingerprint dedup, language rollup, final sort") {
    val df = PipelineQueries.defs("p01_training_prep")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString()
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 3, s"pipeline has $exchanges exchanges:\n$plan")
    // quality gate must be applied before the window shuffle (map-side)
    assert(plan.indexOf("Filter") >= 0)
  }
}
