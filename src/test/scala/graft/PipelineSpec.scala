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

  test("p08 keeps at most CapPerSource docs per source with contiguous ranks") {
    val kept = PipelineQueries.defs("p08_source_cap")(spark, sfDir).collect()
    assert(kept.nonEmpty)
    kept.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      assert(rows.length <= PipelineQueries.CapPerSource, s"$src over cap")
      val ranks = rows.map(_.getAs[Long]("cap_rank")).sorted
      assert(ranks.sameElements(1L to rows.length), s"$src ranks not contiguous")
    }
  }

  test("p08 keeps the BEST docs: no dropped doc outranks a kept one") {
    val df = PipelineQueries.defs("p08_source_cap")(spark, sfDir)
    val all = {
      val nw = graft.functions.TextFunctions.wsTokenCount(col("text"))
      spark.read.parquet(s"$sfDir/documents.parquet").select(
        col("source"), col("doc_id"),
        (when(nw.between(10, 500), 1.0).otherwise(0.5) *
          (lit(1.0) - graft.functions.TextFunctions.punctRatio(col("text"))))
          .as("q"))
    }.collect().groupBy(_.getAs[String]("source"))
    val keptIds = df.collect().map(r =>
      (r.getAs[String]("source"), r.getAs[Long]("doc_id"))).toSet
    all.foreach { case (src, rows) =>
      val (k, d) = rows.partition(r => keptIds((src, r.getAs[Long]("doc_id"))))
      if (d.nonEmpty)
        assert(k.map(_.getAs[Double]("q")).min >= d.map(_.getAs[Double]("q")).max,
          s"$src dropped a doc with higher quality than a kept one")
    }
  }

  test("p08 plans as WindowGroupLimit: map tasks pre-trim to k per source") {
    val plan = PipelineQueries.defs("p08_source_cap")(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k filter did not plan as WindowGroupLimit:\n$plan")
  }
}
