package graft

import graft.queries.{PipelineQueries, TextQueries}
import org.apache.spark.sql.functions._

/** p10 DSIR importance selection + t15 hashed linear classifier. */
class DsirClassifierSpec extends SparkSpec {

  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def writeDocs(dir: String, rows: Seq[(Long, String, String)]): Unit =
    rows.toDF("doc_id", "text", "lang")
      .select(col("doc_id"), col("text"), col("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("p10 ranks target-like docs above raw-like docs with signed weights") {
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString
    // target slice (en) speaks 'alpha'; the raw remainder speaks 'beta'.
    // alpha's bucket is then overrepresented in the target distribution
    // (positive log ratio) and beta's underrepresented (negative).
    writeDocs(dir, Seq(
      (1L, "alpha alpha alpha", "en"), (2L, "alpha alpha alpha", "en"),
      (3L, "beta beta beta", "fr"), (4L, "beta beta beta", "fr")))
    val out = PipelineQueries.defs("p10_dsir_select")(spark, dir).collect()
    assert(out.length == 4)
    val byDoc = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(byDoc(1L) > 0 && byDoc(2L) > 0, s"target docs not positive: $byDoc")
    assert(byDoc(3L) < 0 && byDoc(4L) < 0, s"raw docs not negative: $byDoc")
    // ordering: both en docs before both fr docs
    assert(out.take(2).map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(out.forall(_.getLong(1) == 3L), "n_tokens must be 3 per doc")
  }

  test("p10 keeps at most DsirTopK docs and is rerun-deterministic") {
    val a = PipelineQueries.defs("p10_dsir_select")(spark, sfDir).collect()
    val b = PipelineQueries.defs("p10_dsir_select")(spark, sfDir).collect()
    assert(a.length <= PipelineQueries.DsirTopK && a.nonEmpty)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    // selected weights are the global top: last kept >= any plausible
    // monotonicity check — the list must be non-increasing in logw
    val ws = a.map(_.getDouble(2))
    assert(ws.zip(ws.tail).forall { case (x, y) => x >= y })
  }

  test("p10 plan broadcasts the weight table; corpus is never sort-merge-joined") {
    val plan = PipelineQueries.defs("p10_dsir_select")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), s"corpus shuffled for the weight join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), "top-k must not be a global sort")
  }

  test("t15 single-word doc scores exactly the md5-derived bucket weight") {
    val dir = java.nio.file.Files.createTempDirectory("clf").toString
    writeDocs(dir, Seq((1L, "hello", "en")))
    val out = TextQueries.defs("t15_classifier")(spark, dir).collect()(0)
    val b = java.lang.Long.parseLong(md5hex("clf|hello").substring(0, 4), 16) %
      TextQueries.ClfBuckets
    val w = BigDecimal(
      (java.lang.Long.parseLong(md5hex(s"w|$b").substring(0, 4), 16) - 32767.5) / 65535.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getLong(1) == 1L)
    assert(out.getDouble(2) == w, s"score ${out.getDouble(2)} != expected $w")
    assert(out.getBoolean(3) == (w > 0))
  }

  test("t15 score is the mean over tokens and label matches its sign on the fixture") {
    val rows = TextQueries.defs("t15_classifier")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getBoolean(3) == (r.getDouble(2) > 0)))
    // repeating a word scales the sum but not the mean
    val dir = java.nio.file.Files.createTempDirectory("clf2").toString
    writeDocs(dir, Seq((1L, "hello", "en"), (2L, "hello hello hello", "en")))
    val out = TextQueries.defs("t15_classifier")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(out(1L) - out(2L)) < 1e-12)
  }

  test("t15 plan has no join at all — weights are in-expression") {
    val plan = TextQueries.defs("t15_classifier")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"classifier inference must not join:\n$plan")
  }
}
