package graft

import graft.operators.Similarity
import graft.queries.Ops
import org.apache.hadoop.fs.{Path => HPath}
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 verdict item 5: the trained ANN centroid index persists to
  * caller-configurable shared storage and a LATER consumer — another
  * engine, another session — reuses the committed artifact without
  * retraining. Reuse is observed structurally: the artifact's files
  * (names + mtimes) are untouched by the second resolution, and the
  * served centroids are value-identical to a fresh training run.
  */
class AnnIndexReuseSpec extends AnyFunSuite with SparkSpec {

  private def artifactState(path: String): Seq[(String, Long, Long)] = {
    val p = new HPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).map(s =>
      (s.getPath.getName, s.getLen, s.getModificationTime)).toSeq.sortBy(_._1)
  }

  test("a second engine reuses the committed index without retraining") {
    implicit val s = spark
    val root = java.nio.file.Files.createTempDirectory("graft_reuse").toString
    val embs = Ops.t(spark, sfDir, "embeddings")
    val idxPath = s"$root/ann_centroids/test"

    // first resolution trains and commits
    val first = Similarity.storedKmeansCentroids(embs, idxPath)
    val committed = artifactState(idxPath)
    assert(committed.exists(_._1 == "_SUCCESS"), "index commit incomplete")

    // a second engine on the same corpus resolves the SAME artifact:
    // nothing in the committed directory may change (no rewrite, no
    // re-commit — i.e. no retraining happened)
    val e2 = new GraftEngine(spark,
      GraftConfig(storageRoot = root))
    Tables.all.foreach(t => e2.loadTable(t, s"$sfDir/$t.parquet"))
    val second = Similarity.storedKmeansCentroids(
      Ops.t(spark, sfDir, "embeddings"), idxPath)
    assert(artifactState(idxPath) == committed,
      "second resolution modified the committed index — it retrained")

    // and the served centroids are value-identical to fresh training
    val fresh = Similarity.kmeansCentroids(embs)
    val served = second.orderBy("cent_id").collect()
    val trained = fresh.orderBy("cent_id").collect()
    assert(served.length == trained.length)
    served.zip(trained).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(a.getSeq[Double](1) == b.getSeq[Double](1), s"cv mismatch at ${a.getLong(0)}")
      assert(a.getDouble(2) == b.getDouble(2))
    }
    assert(first.count() == Similarity.NCentroids)
  }

  test("registerAnnView resolves the engine-config storage root") {
    val root = java.nio.file.Files.createTempDirectory("graft_reuse_cfg").toString
    val e = new GraftEngine(spark, GraftConfig(storageRoot = root))
    Tables.all.foreach(t => e.loadTable(t, s"$sfDir/$t.parquet"))
    e.registerAnnView()
    val expected = sources.ArtifactStore.pathFor(
      root, "ann_centroids", s"$sfDir/embeddings.parquet")
    assert(artifactState(expected).exists(_._1 == "_SUCCESS"),
      s"index not committed under the configured root at $expected")
    assert(spark.sql("SELECT * FROM graft_ann_topk").count() > 0)
  }

  test("batch admission (s07) matches full assignment and never retrains") {
    implicit val s = spark
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft_admit").toString
    val embs = Ops.t(spark, sfDir, "embeddings")
    val idxPath = s"$root/ann_centroids/test"
    val cents = Similarity.storedKmeansCentroids(embs, idxPath)
    val committed = artifactState(idxPath)
    val admitted = Similarity
      .admitBatch(embs.filter(col("vec_id") % 10 === 7), cents)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // the index is read-only under admission — no rewrite, no retrain
    assert(artifactState(idxPath) == committed)
    // per-vector independence: the batch lands exactly where a
    // full-corpus assignment would put those vectors
    val full = Similarity.admitBatch(embs, cents)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(admitted.nonEmpty)
    admitted.foreach { case (id, v) => assert(full(id) == v, s"vec $id diverged") }
    assert(admitted.keySet == full.keySet.filter(_ % 10 == 7))
  }

  test("a parameter change rebuilds instead of serving the stale index") {
    implicit val s = spark
    val root = java.nio.file.Files.createTempDirectory("graft_reuse_salt").toString
    val embs = Ops.t(spark, sfDir, "embeddings")
    val idxPath = s"$root/ann_centroids/test"
    Similarity.storedKmeansCentroids(embs, idxPath, iters = 1)
    val one = artifactState(idxPath)
    // different training params → fingerprint mismatch → rebuild
    val rebuilt = Similarity.storedKmeansCentroids(embs, idxPath, iters = 2)
    assert(artifactState(idxPath) != one, "stale index served across a param change")
    assert(rebuilt.count() == Similarity.NCentroids)
  }
}
