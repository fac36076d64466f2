package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-17 scratch probe: ABBA-ordered A/B of the adaptive scan
  * fan-out on q57's exact-decimal power sums (the heaviest per-row
  * decimal work after h01) — interleaved passes defeat the box's
  * multi-second contention drift that single-block timing cannot.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftEngine.session(GraftConfig(
      master = s"local[$cpus]", appName = "graft-optprobe", shufflePartitions = cpus))
    GraftEngine.cachedForDir(spark, sfDir).enableCbo(cached = true)

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def q57(fan: Boolean): org.apache.spark.sql.DataFrame = {
      val d19 = DecimalType(19, 4)
      val d18 = DecimalType(18, 4)
      val base = queries.Ops.t(spark, sfDir, "lineitem")
      val l = if (fan) queries.Ops.fanScan(base) else base
      val g = l.groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast(d18)).as("sx"),
        sum(col("l_extendedprice").cast(d18)).as("sy"),
        sum(col("l_quantity").cast(d19) * col("l_extendedprice").cast(d18)).as("sxy"),
        sum(col("l_quantity").cast(d19) * col("l_quantity").cast(d18)).as("sxx"),
        sum(col("l_extendedprice").cast(d19) * col("l_extendedprice").cast(d18)).as("syy"))
      val (n, sx, sy, sxy, sxx, syy) = (col("n").cast("double"),
        col("sx").cast("double"), col("sy").cast("double"),
        col("sxy").cast("double"), col("sxx").cast("double"), col("syy").cast("double"))
      val cov = n * sxy - sx * sy
      val vx = n * sxx - sx * sx
      val vy = n * syy - sy * sy
      val slope = cov / vx
      g.select(col("l_returnflag"), col("n"),
        round(cov / (sqrt(vx) * sqrt(vy)), 6).as("pearson_r"),
        round(slope, 6).as("slope"),
        round((sy - slope * sx) / n, 6).as("intercept"))
        .coalesce(1).orderBy("l_returnflag")
    }

    def q03(fan: Boolean): org.apache.spark.sql.DataFrame = {
      val base = queries.Ops.t(spark, sfDir, "lineitem")
      val l = if (fan) queries.Ops.fanScan(base) else base
      import queries.Ops.{dsum, davg}
      l.filter(l("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .coalesce(1).orderBy("l_returnflag", "l_linestatus")
    }
    noop(q03(fan = false)); noop(q03(fan = true))
    val a3 = collection.mutable.Buffer[Double]()
    val b3 = collection.mutable.Buffer[Double]()
    (1 to 6).foreach { i =>
      def t(body: => Unit): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
      if (i % 2 == 1) { a3 += t(noop(q03(false))); b3 += t(noop(q03(true))) }
      else { b3 += t(noop(q03(true))); a3 += t(noop(q03(false))) }
    }
    println(f"[optprobe] q03 base min=${a3.min}%.3f passes=${a3.map(x => f"$x%.3f").mkString(",")}")
    println(f"[optprobe] q03 fan  min=${b3.min}%.3f passes=${b3.map(x => f"$x%.3f").mkString(",")}")

    def abba(name: String, mk: Boolean => org.apache.spark.sql.DataFrame): Unit = {
      noop(mk(false)); noop(mk(true))
      val av = collection.mutable.Buffer[Double]()
      val bv = collection.mutable.Buffer[Double]()
      (1 to 6).foreach { i =>
        def t(body: => Unit): Double = {
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
        if (i % 2 == 1) { av += t(noop(mk(false))); bv += t(noop(mk(true))) }
        else { bv += t(noop(mk(true))); av += t(noop(mk(false))) }
      }
      println(f"[optprobe] $name base min=${av.min}%.3f passes=${av.map(x => f"$x%.3f").mkString(",")}")
      println(f"[optprobe] $name fan  min=${bv.min}%.3f passes=${bv.map(x => f"$x%.3f").mkString(",")}")
    }

    // t16: fan the document scan feeding the bigram explode
    import graft.functions.TextFunctions.words
    def t16(fan: Boolean): org.apache.spark.sql.DataFrame = {
      val dec6 = DecimalType(28, 6)
      val d0 = queries.Ops.t(spark, sfDir, "documents")
      val d = if (fan) queries.Ops.fanScan(d0) else d0
      val docsW = d.select(col("doc_id"), words(col("text")).as("w"))
      val bi = docsW.filter(size(col("w")) >= 2)
        .select(col("doc_id"), explode(transform(sequence(lit(0), size(col("w")) - 2),
          i => struct(element_at(col("w"), i + 1).as("w1"),
            element_at(col("w"), i + 2).as("w2")))).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val bf = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        .localCheckpoint(eager = false)
      val leftCounts = bf.groupBy("w1").agg(sum(col("c12")).as("c1"))
      val vocab = bf.select(col("w1").as("t")).union(bf.select(col("w2").as("t")))
        .agg(countDistinct(col("t")).as("v"))
      val model = bf.join(leftCounts, "w1")
        .crossJoin(broadcast(vocab))
        .select(col("w1"), col("w2"), round(-log(
          (col("c12").cast("double") + lit(graft.queries.TextQueries.BigramK)) /
            (col("c1").cast("double") + lit(graft.queries.TextQueries.BigramK) * col("v").cast("double"))), 6)
          .as("nll"))
      bi.join(broadcast(model), Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          (sum(col("nll").cast(dec6)).cast("double") / count(lit(1))).as("mean_nll"))
        .withColumn("ppl", round(exp(col("mean_nll")), 4))
        .orderBy("doc_id")
    }
    abba("t16", t16)

    // d09: fan the batch side feeding minhash signature derivation
    def d09(fan: Boolean): org.apache.spark.sql.DataFrame = {
      implicit val sp = spark
      val docs = queries.Ops.t(spark, sfDir, "documents")
      val batch0 = docs.filter(col("doc_id") % 2 === 1)
      val batch = if (fan) queries.Ops.fanScan(batch0) else batch0
      graft.operators.Dedup.incrementalKeep(
        graft.operators.Dedup.storedBandIndex(docs, queries.DedupQueries.bandIndexPath(sfDir))
          .filter(col("doc_id") % 2 === 0),
        batch).orderBy("doc_id")
    }
    abba("d09", d09)

    // p02 / t09 / d17: bench-window negatives — re-adjudicate under ABBA
    import graft.functions.TextFunctions.{piiRedact, wsTokenCount, punctRatio, bpeTokenCount}
    def p02(fan: Boolean): org.apache.spark.sql.DataFrame = {
      implicit val sp = spark
      val docs0 = queries.Ops.t(spark, sfDir, "documents")
      val docs = if (fan) queries.Ops.fanScan(docs0) else docs0
      val kept = graft.operators.Dedup
        .storedClusters(docs0, queries.DedupQueries.clusterIndexPath(sfDir))
        .filter(col("is_kept") === 1).select("doc_id")
      docs.join(kept, Seq("doc_id"), "left_semi")
        .withColumn("clean_text", piiRedact(col("text")))
        .withColumn("n_words", wsTokenCount(col("clean_text")))
        .withColumn("punct_ratio", punctRatio(col("clean_text")))
        .filter(col("n_words") >= 10 && col("punct_ratio") <= 0.3)
        .groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("total_words"),
          sum(bpeTokenCount(col("clean_text"))).as("total_tokens"))
        .coalesce(1).orderBy("lang")
    }
    abba("p02", p02)
    def d17(fan: Boolean): org.apache.spark.sql.DataFrame = {
      val docs0 = queries.Ops.t(spark, sfDir, "documents")
      val docs = if (fan) queries.Ops.fanScan(docs0) else docs0
      graft.operators.Dedup.segmentDedup(docs).orderBy("doc_id")
    }
    abba("d17", d17)

    def d15(fan: Boolean): org.apache.spark.sql.DataFrame = {
      val p0 = queries.Ops.t(spark, sfDir, "part")
      val p = if (fan) queries.Ops.fanScan(p0) else p0
      val dirty = p.select(col("p_partkey"),
        graft.operators.Resolve
          .deleteOneChar(col("p_name"), "fz", col("p_partkey")).as("dirty_name"))
      graft.operators.Resolve
        .resolve(dirty, p0, "p_partkey", "dirty_name", "p_name")
        .orderBy("p_partkey")
    }
    abba("d15", d15)
    def s06(fan: Boolean): org.apache.spark.sql.DataFrame = {
      val e0 = queries.Ops.t(spark, sfDir, "embeddings")
      val e = if (fan) queries.Ops.fanScan(e0) else e0
      graft.operators.Similarity.quantizedTopK(e, nQueries = 5)
        .coalesce(1).orderBy("query_id", "rank")
    }
    abba("s06", s06)
    def d05(fan: Boolean): org.apache.spark.sql.DataFrame = {
      val e0 = queries.Ops.t(spark, sfDir, "embeddings")
      val e = if (fan) queries.Ops.fanScan(e0) else e0
      graft.operators.Dedup.embeddingCosinePairs(e).orderBy("vec_a", "vec_b")
    }
    abba("d05", d05)

    def s09(fan: Boolean): org.apache.spark.sql.DataFrame = {
      implicit val sp = spark
      val e = queries.Ops.t(spark, sfDir, "embeddings")
      val (cbPath, codesPath) = queries.SimilarityQueries.pqIndexPaths(sfDir)
      val (cbs, codes0) = graft.operators.Similarity.storedPqIndex(e, cbPath, codesPath)
      val codes = if (fan) queries.Ops.fanScan(codes0) else codes0
      graft.operators.Similarity.pqTopKWith(e, cbs, codes, nQueries = 5)
        .coalesce(1).orderBy("query_id", "rank")
    }
    abba("s09", s09)
    def s04(fan: Boolean): org.apache.spark.sql.DataFrame = {
      implicit val sp = spark
      val e = queries.Ops.t(spark, sfDir, "embeddings")
      val corp = if (fan) graft.operators.Similarity.preparedCorpus(queries.Ops.fanScan(e))
                 else graft.operators.Similarity.preparedCorpus(e)
      graft.operators.Similarity.ivfTopKWith(corp,
          graft.operators.Similarity.storedKmeansCentroids(e, queries.SimilarityQueries.annIndexPath(sfDir)),
          graft.operators.Similarity.defaultQueries(e, 5))
        .coalesce(1).orderBy("query_id", "rank")
    }
    abba("s04", s04)

    noop(q57(fan = false)); noop(q57(fan = true)) // warm both
    val a = collection.mutable.Buffer[Double]()
    val b = collection.mutable.Buffer[Double]()
    (1 to 6).foreach { i =>
      def t(body: => Unit): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
      if (i % 2 == 1) { a += t(noop(q57(false))); b += t(noop(q57(true))) }
      else { b += t(noop(q57(true))); a += t(noop(q57(false))) }
    }
    println(f"[optprobe] q57 base min=${a.min}%.3f passes=${a.map(x => f"$x%.3f").mkString(",")}")
    println(f"[optprobe] q57 fan  min=${b.min}%.3f passes=${b.map(x => f"$x%.3f").mkString(",")}")
    spark.stop()
  }
}
