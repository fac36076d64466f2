package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry aggregating every query family for the driver contract. */
object Queries {
  def all: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.defs ++ ExtQueries.defs ++ TextQueries.defs ++ DedupQueries.defs ++
      SimilarityQueries.defs ++ MultimodalQueries.defs ++ StreamingQueries.defs ++
      PipelineQueries.defs ++ SqlSurfaceQueries.defs ++ TpchQueries.defs ++ EventQueries.defs

  def oracles: Map[String, String] =
    CoreQueries.oracles ++ ExtQueries.oracles ++ TextQueries.oracles ++ DedupQueries.oracles ++
      SimilarityQueries.oracles ++ MultimodalQueries.oracles ++ StreamingQueries.oracles ++
      PipelineQueries.oracles ++ SqlSurfaceQueries.oracles ++ TpchQueries.oracles ++ EventQueries.oracles

  /** Bench-only production-mode twins of the queries whose runtime is
    * dominated by the exact-decimal oracle discipline (SURVEY §6
    * measures it at ~5× on money/NLL sums): same plans, plain double
    * sums. Benched as `<prefix>_fast_double` next to their exact forms
    * so the production-vs-oracle-discipline ratio is a recorded number
    * per round; NOT part of the driver correctness contract
    * (FastMathSpec bounds each twin's drift against its exact form). */
  def fastTwins: Seq[(String, (SparkSession, String) => DataFrame)] =
    TpchQueries.decimalBound.map(n => n -> (TpchQueries.fastQuery(n) _)) ++ Seq(
      "q57_corr_ols" -> (CoreQueries.corrOlsFast _),
      "t16_bigram_ppl" -> (TextQueries.bigramPplFast _),
      "p10_dsir_select" -> (PipelineQueries.dsirSelectFast _))
}
