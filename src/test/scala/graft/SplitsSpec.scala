package graft

import graft.operators.Splits
import org.apache.spark.sql.functions._

class SplitsSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("p03 split proportions land near 80/10/10 and cover every row") {
    val n = docs.count()
    val bySplit = Splits.assignSplit(docs, col("doc_id"))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum == n)
    // binomial tolerance: ±6 pp at 500 rows is > 4 sigma
    assert(math.abs(bySplit("train").toDouble / n - 0.80) < 0.06, bySplit.toString)
    assert(math.abs(bySplit("val").toDouble / n - 0.098) < 0.06, bySplit.toString)
    assert(math.abs(bySplit("test").toDouble / n - 0.102) < 0.06, bySplit.toString)
  }

  test("p06 leakage-safe split: every near-dup cluster lands in ONE split") {
    import spark.implicits._
    // two near-dup pairs + a singleton; a naive per-doc split could
    // strand twins across train/test, the cluster-keyed split cannot
    val planted = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "completely different content about databases and storage engines"),
      (4L, "completely different content about databases and storage engines"),
      (5L, "a singleton document matching nothing else in this corpus")).toDF("doc_id", "text")
    val split = Splits.assignSplit(
      graft.operators.Dedup.clusters(planted), col("cluster_rep"))
    val perCluster = split.groupBy("cluster_rep")
      .agg(countDistinct("split").as("n_splits")).collect()
    assert(perCluster.forall(_.getAs[Long]("n_splits") == 1L))
    // and on the real corpus: no cluster straddles two splits
    val real = Splits.assignSplit(
      graft.operators.Dedup.clusters(docs), col("cluster_rep"))
      .groupBy("cluster_rep").agg(countDistinct("split").as("n_splits"))
      .filter(col("n_splits") > 1).count()
    assert(real == 0)
  }

  test("split assignment is stable: a subset's rows keep their assignment in the full corpus") {
    val full = Splits.assignSplit(docs, col("doc_id")).select("doc_id", "split")
    val subset = Splits.assignSplit(docs.filter(col("doc_id") % 7 === 0), col("doc_id"))
      .select(col("doc_id"), col("split").as("subset_split"))
    val moved = full.join(subset, "doc_id")
      .filter(col("split") =!= col("subset_split")).count()
    assert(moved == 0, "hash-split must not reassign rows when the corpus changes")
  }

  test("split assignment is independent of partition layout") {
    val a = Splits.assignSplit(docs.repartition(1), col("doc_id"))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Splits.assignSplit(docs.repartition(17, col("lang")), col("doc_id"))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("split is map-side only: no shuffle in the assignment plan") {
    val plan = Splits.assignSplit(docs, col("doc_id"))
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"hash-split must not shuffle:\n$plan")
  }

  test("seed changes the assignment (bucket namespaces are independent)") {
    val a = Splits.assignSplit(docs, col("doc_id"), seed = "split")
    val b = Splits.assignSplit(docs, col("doc_id"), seed = "other")
      .withColumnRenamed("split", "split_b")
    val differing = a.select("doc_id", "split")
      .join(b.select("doc_id", "split_b"), "doc_id")
      .filter(col("split") =!= col("split_b")).count()
    assert(differing > 0)
  }

  test("p04 rebalance levels the language mixture near the smallest language") {
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minN = perLang.values.min
    val kept = Splits.rebalanceDomains(docs, col("lang"), col("doc_id"))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet == perLang.keySet)
    // the smallest language keeps everything (threshold 0x100)
    val smallest = perLang.minBy(_._2)._1
    assert(kept(smallest) == minN)
    kept.foreach { case (lang, k) =>
      assert(k <= perLang(lang), s"$lang grew")
      // expectation is ~minN per language; allow binomial spread
      assert(math.abs(k - minN.toDouble) < math.max(12.0, 4 * math.sqrt(minN.toDouble)),
        s"$lang kept $k, expected ≈$minN of ${perLang(lang)}")
    }
  }

  test("p04 keep decision broadcasts the threshold table; the corpus is not shuffled") {
    val plan = Splits.rebalanceDomains(docs, col("lang"), col("doc_id"))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast threshold join:\n$plan")
    assert(!plan.contains("ShuffledHashJoin") && !plan.contains("SortMergeJoin"),
      s"corpus must not shuffle for the keep decision:\n$plan")
  }

  test("p05 shard packing: shards fill consecutively, never split a doc, respect the budget") {
    import graft.functions.TextFunctions.wsTokenCount
    val budget = 1000L
    val packed = Splits.packShards(docs.select(col("doc_id"), col("text")),
      col("doc_id"), wsTokenCount(col("text")), budget, blockSize = 100L)
      .select("doc_id", "n_tokens", "shard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // shard ids are monotone in doc order and skip nothing
    val shards = packed.map(_._3)
    assert(shards.zip(shards.tail).forall { case (a, b) => a <= b && b - a <= 1 })
    assert(shards.head == 0)
    // each shard's PREFIX (all but its last doc) stays under the budget:
    // greedy packing overflows only by the final doc, which is never split
    packed.groupBy(_._3).values.foreach { rows =>
      val sorted = rows.sortBy(_._1)
      val prefix = sorted.dropRight(1).map(_._2).sum
      assert(prefix < budget, s"shard ${sorted.head._3} prefix $prefix >= $budget")
    }
    // exact equivalence with a single global running sum
    val global = packed.map(_._2).scanLeft(0L)(_ + _).dropRight(1)
    assert(packed.map(_._3).sameElements(global.map(_ / budget)))
  }

  test("p05 plan is blocked: corpus windows partition by block, never one global partition") {
    import graft.functions.TextFunctions.wsTokenCount
    val packed = Splits.packShards(docs.select(col("doc_id"), col("text")),
      col("doc_id"), wsTokenCount(col("text")), 1000L, blockSize = 100L)
    val plan = packed.queryExecution.executedPlan.toString()
    assert(plan.contains("hashpartitioning(__block"),
      s"corpus running sum must shuffle on the block key only:\n$plan")
    // the single-partition window exists only over the tiny block-totals
    // aggregate (its input is the groupBy(__block) output), by construction
    assert(plan.contains("Window"), plan)
  }

  test("rebalance is deterministic across reruns and partitionings") {
    val a = Splits.rebalanceDomains(docs.repartition(3), col("lang"), col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Splits.rebalanceDomains(docs.repartition(23, col("doc_id")), col("lang"), col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("p07 stratified sample keeps exactly min(k, |stratum|) per stratum, deterministically") {
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val k = 40
    val kept = Splits.stratifiedSample(docs, col("lang"), col("doc_id"), k)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet == perLang.keySet)
    kept.foreach { case (lang, n) =>
      assert(n == math.min(k.toLong, perLang(lang)),
        s"$lang kept $n of ${perLang(lang)}, wanted min($k, ...)")
    }
    // deterministic under repartitioning
    val a = Splits.stratifiedSample(docs.repartition(1), col("lang"), col("doc_id"), k)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Splits.stratifiedSample(docs.repartition(19, col("text")), col("lang"), col("doc_id"), k)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("p07 plans as WindowGroupLimit: map tasks pre-trim to k per stratum before the shuffle") {
    val plan = Splits.stratifiedSample(docs, col("lang"), col("doc_id"), 40)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("WindowGroupLimit"),
      s"no WindowGroupLimit — a giant stratum would fully sort through the window:\n$plan")
  }

  test("p09 token budget: maximal hash-order prefix, equals the global running sum") {
    import graft.functions.TextFunctions.wsTokenCount
    val budget = 700L
    val got = Splits.tokenBudgetSample(docs.select(col("doc_id"), col("text")),
        col("doc_id"), wsTokenCount(col("text")), budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute-force oracle: one global running sum in seeded-hash order
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val all = docs.select(col("doc_id"), wsTokenCount(col("text")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .map { case (id, n) => (md5hex(s"budget|$id"), id, n) }
      .sortBy(t => (t._1, t._2))
    val want = all.scanLeft(("", 0L, 0L, 0L)) { case ((_, _, _, cum), (h, id, n)) =>
      (h, id, n, cum + n)
    }.drop(1).takeWhile(_._4 <= budget)
      .map(t => (t._2, t._3, t._4)).sortBy(_._1)
    assert(got.sortBy(_._1).toSeq == want.toSeq,
      "blocked prefix selection must equal the single global running sum")
    // maximality: the next hash-order doc would blow the budget
    val selected = got.map(_._1).toSet
    val next = all.find(t => !selected(t._2))
    next.foreach { n =>
      assert(got.map(_._2).sum + n._3 > budget, "selection is not maximal")
    }
  }

  test("p09 plan is blocked: corpus running sum partitions by the hash-prefix block") {
    import graft.functions.TextFunctions.wsTokenCount
    val plan = Splits.tokenBudgetSample(docs.select(col("doc_id"), col("text")),
        col("doc_id"), wsTokenCount(col("text")), 700L)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("hashpartitioning(__block"),
      s"corpus running sum must shuffle on the block key only:\n$plan")
  }

  test("p12 BPE-token budget equals the global running sum over t20's counts") {
    import graft.queries.{PipelineQueries, Queries, TextQueries}
    import org.apache.spark.sql.expressions.Window
    val got = Queries.all("p12_bpe_budget")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty, "budget selected nothing — raise TokenBudget or check t20")
    // oracle twin in-engine: ONE global running sum over the t20 frame
    // in 'bpe'-seeded hash order (the shape the blocked plan reproduces)
    val w = Window.orderBy(col("__h"), col("doc_id"))
    val want = TextQueries.bpeEncode(spark, sfDir)
      .withColumn("__h", md5(concat(lit("bpe|"), col("doc_id").cast("string"))))
      .withColumn("cum", sum(col("n_bpe_tokens")).over(w))
      .filter(col("cum") <= PipelineQueries.TokenBudget)
      .select("doc_id", "n_bpe_tokens", "cum")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.sortBy(_._1).toSeq == want.sortBy(_._1).toSeq,
      "blocked BPE-budget selection must equal the single global running sum")
    // true-tokenizer budget, not the whitespace proxy: counts differ
    val ws = graft.functions.TextFunctions.wsTokenCount(col("text"))
    val wsMap = graft.queries.Ops.t(spark, sfDir, "documents")
      .select(col("doc_id"), ws.cast("long").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.exists { case (id, n, _) => wsMap.get(id).exists(_ != n) },
      "every selected doc's BPE count equals its whitespace count — proxy suspected")
  }

  test("p11 priority sample keeps exactly k rows with threshold-adjusted weights") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, 10L + i % 90)).toDF("doc_id", "w")
    val out = Splits.prioritySample(df, col("doc_id"), col("w"), k = 20).collect()
    assert(out.length == 20)
    val tau = out.map(_.getDouble(3)).min // every est >= tau by construction
    out.foreach { r =>
      val (w, pri, est) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(est == math.max(w.toDouble, tau) || est >= w.toDouble)
      assert(pri >= tau, "a kept row's priority may not fall under the threshold")
    }
    // deterministic: same seed, same data, any partitioning
    val out2 = Splits.prioritySample(df.repartition(7), col("doc_id"), col("w"), k = 20)
      .collect().map(_.getLong(0)).toSet
    assert(out2 == out.map(_.getLong(0)).toSet)
  }

  test("p11 returns a <=k corpus whole, estimator exact (est_weight = weight)") {
    import spark.implicits._
    val df = (1L to 5L).map(i => (i, 7L * i)).toDF("doc_id", "w")
    val out = Splits.prioritySample(df, col("doc_id"), col("w"), k = 20)
      .orderBy("doc_id").collect()
    assert(out.length == 5)
    out.foreach(r => assert(r.getDouble(3) == r.getLong(1).toDouble))
  }

  test("p11 plans the top-(k+1) as TakeOrderedAndProject (no global sort)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val plan = Splits.prioritySample(docs, col("doc_id"), col("n_chars"), k = 100)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be per-partition + driver merge:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"priority sampling must not globally sort the corpus:\n$plan")
  }
}
