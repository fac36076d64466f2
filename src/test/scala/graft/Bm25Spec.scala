package graft

import graft.queries.TextQueries
import org.scalatest.funsuite.AnyFunSuite

/** t12 BM25 retrieval scoring (§2 #35): exact value on a hand-checked
  * corpus, ranking properties (tf saturation, length normalization),
  * and the scale plan shape (TakeOrderedAndProject, no global window).
  */
class Bm25Spec extends AnyFunSuite with SparkSpec {

  // replica of the query's arithmetic for the expected-value check
  private def bm25(tf: Long, df: Long, dl: Long, nDocs: Long, avgdl: Double): Double = {
    val k1 = TextQueries.Bm25K1; val b = TextQueries.Bm25B
    val idf = math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
    val c = BigDecimal(idf * (tf * (k1 + 1.0)) /
      (tf + k1 * ((1.0 - b) + b * dl / avgdl)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    c.toDouble
  }

  private def runOn(rows: Seq[(Long, String)]): Map[Long, (Double, Int)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bm25").toString
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    graft.queries.TextQueries.defs("t12_bm25")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2))).toMap
  }

  test("exact score on a hand-checked corpus") {
    // 4 docs; terms: join (df=2), stream (df=1), vector (df=0 here)
    val rows = Seq(
      1L -> "join join scan",            // dl=3, tf(join)=2
      2L -> "join scan scan scan",       // dl=4, tf(join)=1
      3L -> "stream scan",               // dl=2, tf(stream)=1
      4L -> "scan scan")                 // dl=2, no query terms
    val avgdl = (3 + 4 + 2 + 2) / 4.0
    val got = runOn(rows)
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L)._2 == 1 && got(2L)._2 == 1 && got(3L)._2 == 1)
    assert(math.abs(got(1L)._1 - bm25(2, 2, 3, 4, avgdl)) < 1e-9)
    assert(math.abs(got(2L)._1 - bm25(1, 2, 4, 4, avgdl)) < 1e-9)
    assert(math.abs(got(3L)._1 - bm25(1, 1, 2, 4, avgdl)) < 1e-9)
  }

  test("ranking properties: rarer term outranks common at equal tf; tf saturates") {
    val got = runOn(Seq(
      1L -> "join pad pad pad",          // common term (df=3)
      2L -> "stream pad pad pad",        // rare term (df=1)
      3L -> "join pad join pad",         // higher tf of the common term
      4L -> "join pad pad pad"))
    // rarer term carries higher idf at the same tf/dl
    assert(got(2L)._1 > got(1L)._1)
    // more occurrences score higher, sublinearly (saturation), never lower
    assert(got(3L)._1 > got(1L)._1)
    assert(got(3L)._1 < 2 * got(1L)._1)
  }

  test("plan: top-k is TakeOrderedAndProject, no global single-partition window") {
    val plan = GraftEngine.explainPlan(
      graft.queries.TextQueries.defs("t12_bm25")(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not pre-trimmed:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window operator:\n$plan")
  }
}
