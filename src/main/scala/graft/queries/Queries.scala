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
}
