package graft.queries

import graft.operators.{Dedup, Similarity}
import Ops._

/** Driver-contract wiring for similarity search s01–s02 (SURVEY.md §2
  * #23–#24). As with dedup, the DuckDB oracles are generated from the
  * same constants as the Spark operators (query count, k, sign-bucket
  * width, 6-dp rounding) so both engines rank identically.
  */
object SimilarityQueries {

  private val NQueries = 5

  private val sqlDot = Ops.sqlListDot("q.qv", "c.v")
  private val sqlQNorm = Ops.sqlListNorm("q.qv")
  private val sqlCNorm = Ops.sqlListNorm("c.v")

  private val sqlPrep =
    s"""e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $NQueries)""".stripMargin

  val defs: Map[String, Q] = Map(
    // #23 exact brute-force cosine top-k (query side broadcast)
    "s01_topk_cosine" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(e, Similarity.defaultQueries(e, NQueries))
        .orderBy("query_id", "rank")
    }),

    // #24 LSH-bucketed approximate top-k (equi-join on sign bucket)
    "s02_ann_lsh" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.annTopK(e, Similarity.defaultQueries(e, NQueries))
        .orderBy("query_id", "rank")
    }),

    // s03 IVF-style ANN: data-adaptive cells + nProbe probing (map-side
    // cell assignment; candidate join is an equi-join on the cell id)
    "s03_ann_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfTopK(e, Similarity.defaultQueries(e, NQueries))
        .orderBy("query_id", "rank")
    }))

  val oracles: Map[String, String] = Map(
    "s01_topk_cosine" ->
      s"""WITH $sqlPrep,
         |scored AS (
         |  SELECT q.query_id, c.vec_id,
         |    round($sqlDot / ($sqlQNorm * $sqlCNorm), 6) AS cos
         |  FROM e c CROSS JOIN q WHERE c.vec_id <> q.query_id)
         |SELECT query_id, vec_id, cos, rank FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER
         |    (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
         |  FROM scored)
         |WHERE rank <= ${Similarity.K}
         |ORDER BY query_id, rank""".stripMargin,

    "s03_ann_ivf" -> {
      val dotEC = Ops.sqlListDot("e.v", "c.cv")
      val dotQC = Ops.sqlListDot("q.qv", "c.cv")
      val eNorm = Ops.sqlListNorm("e.v")
      val qNorm = Ops.sqlListNorm("q.qv")
      val cNorm = Ops.sqlListNorm("c.cv")
      val dotAC = Ops.sqlListDot("q.qv", "a.v")
      val aNorm = Ops.sqlListNorm("a.v")
      s"""WITH $sqlPrep,
         |cents AS (SELECT vec_id AS cent_id, v AS cv FROM e
         |  WHERE vec_id < ${Similarity.NCentroids}),
         |assigned AS (
         |  SELECT vec_id, v, cell FROM (
         |    SELECT e.vec_id, e.v, c.cent_id AS cell,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY round($dotEC / ($eNorm * $cNorm), 6) DESC, c.cent_id ASC) AS rn
         |    FROM e CROSS JOIN cents c) WHERE rn = 1),
         |probes AS (
         |  SELECT query_id, qv, cell FROM (
         |    SELECT q.query_id, q.qv, c.cent_id AS cell,
         |      ROW_NUMBER() OVER (PARTITION BY q.query_id
         |        ORDER BY round($dotQC / ($qNorm * $cNorm), 6) DESC, c.cent_id ASC) AS rn
         |    FROM q CROSS JOIN cents c) WHERE rn <= ${Similarity.NProbe}),
         |scored AS (
         |  SELECT q.query_id, a.vec_id,
         |    round($dotAC / ($qNorm * $aNorm), 6) AS cos
         |  FROM assigned a JOIN probes q
         |    ON a.cell = q.cell AND a.vec_id <> q.query_id)
         |SELECT query_id, vec_id, cos, rank FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER
         |    (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
         |  FROM scored)
         |WHERE rank <= ${Similarity.K}
         |ORDER BY query_id, rank""".stripMargin
    },

    "s02_ann_lsh" ->
      s"""WITH $sqlPrep,
         |qb AS (SELECT query_id, qv, ${Ops.sqlSignBucket("qv", Dedup.SignBits)} AS qbucket FROM q),
         |cb AS (SELECT vec_id, v, ${Ops.sqlSignBucket("v", Dedup.SignBits)} AS bucket FROM e),
         |scored AS (
         |  SELECT q.query_id, c.vec_id,
         |    round($sqlDot / ($sqlQNorm * $sqlCNorm), 6) AS cos
         |  FROM cb c JOIN qb q ON c.bucket = q.qbucket AND c.vec_id <> q.query_id)
         |SELECT query_id, vec_id, cos, rank FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER
         |    (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
         |  FROM scored)
         |WHERE rank <= ${Similarity.K}
         |ORDER BY query_id, rank""".stripMargin)
}
