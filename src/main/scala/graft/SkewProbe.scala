package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew measurements on the engineered-hot-key sf1 corpus (round-3
  * verdict item 1): quantifies the two 100 TB skew defenses where skew
  * actually exists, against honest naive baselines on the SAME data.
  *
  *  1. join_skew: lineitem ⋈ orders where one orderkey carries ~20 % of
  *     all lineitem rows — AQE skew-split ON vs OFF. The skewed shuffle
  *     partition is split into advisory-sized sub-splits at runtime;
  *     OFF, one reducer drags the stage. (Thresholds are scaled to the
  *     local corpus — at the default 256 MB gate a ~100 MB hot partition
  *     would never trigger; production keeps the defaults.)
  *  2. distinct_skew: COUNT(DISTINCT value) per user where one user owns
  *     ~20 % of events. The naive plan shuffles every hot-user row to
  *     ONE reducer for dedup; the salted two-phase plan
  *     (group by (user, hash(value) % NSalts) → distinct partials →
  *     re-merge) spreads the hot user over NSalts reducers and stays
  *     exact, because equal values always share a salt bucket.
  *
  * Prints one JSON line per measurement for SCALE.md. Usage:
  * `sbt "runMain graft.SkewProbe [sfskewDir]"`.
  */
object SkewProbe {
  val NSalts = 16

  def saltedDistinctPerUser(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), pmod(hash(col("value")), lit(NSalts)).as("salt"))
      .agg(count_distinct(col("value")).as("pd"))
      .groupBy("user_id")
      .agg(sum(col("pd")).as("n_distinct"))

  def naiveDistinctPerUser(events: DataFrame): DataFrame =
    events.groupBy("user_id").agg(count_distinct(col("value")).as("n_distinct"))

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1/sf1skew")
    val spark = GraftEngine.session(GraftConfig(master = "local[32]", appName = "graft-skew"))
    // local-scale AQE skew gates (see scaladoc); production uses defaults
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    // neither fact side broadcasts at 100 TB; locally the pruned orders
    // projection would fit under the default threshold and dissolve the
    // shuffle join being measured
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def tbl(n: String) = spark.read.parquet(s"$dir/$n.parquet")

    def time(name: String, extra: String = "")(df: => DataFrame): Unit = {
      // min of two timed runs, matching Bench's methodology (damps
      // JIT/GC noise so ON-vs-OFF deltas track the plan, not luck)
      val sec = Seq.fill(2) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"""{"op":"$name","sec":$sec%.2f$extra}""")
    }

    def hotJoin(): DataFrame =
      tbl("lineitem").join(tbl("orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(sum(col("l_quantity").cast(DecimalType(28, 4))).cast("double").as("sum_qty"),
          count(lit(1)).as("cnt"))
        // (same join + thresholds as SkewScaleSpec, measured instead of asserted)

    hotJoin().write.format("noop").mode("overwrite").save() // warmup
    val planned = hotJoin()
    planned.collect() // finalizes THIS plan's AQE stages (3 rows)
    val skewApplied = planned.queryExecution.executedPlan.toString().contains("skew=true")
    println(s"""{"op":"join_skew_plan","skew_split_applied":$skewApplied}""")
    time("join_skew_aqe_on")(hotJoin())
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    time("join_skew_aqe_off")(hotJoin())
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    // q38 vs q44 on the hot-user corpus: the uncapped interval join's
    // output grows quadratically in the hot key's rate; the capped
    // variant bounds it at AttributionCap × clicks
    // fixture-vintage-adaptive ts normalization (same as Ops.events)
    val evJraw = tbl("events")
    val evJ = evJraw.withColumn("ts", graft.queries.Ops.normalizeEventTs(evJraw))
    val clicks = evJ.filter(col("event_type") === "click")
    val purchases = evJ.filter(col("event_type") === "purchase")
    val uncapped = streaming.EventStreams
      .clickPurchaseJoin(clicks, purchases).count()
    val capped = streaming.EventStreams
      .clickPurchaseJoinCapped(clicks, purchases).count()
    println(s"""{"op":"attribution_join_rows","uncapped":$uncapped,"capped":$capped}""")

    val ev = tbl("events")
    naiveDistinctPerUser(ev).write.format("noop").mode("overwrite").save() // warmup
    time("distinct_naive")(naiveDistinctPerUser(ev))
    time("distinct_salted")(saltedDistinctPerUser(ev))
    // the quantity that kills the naive plan at 100 TB is the hot
    // REDUCER's load (every hot-user row converges on one task, and its
    // distinct-set must fit that task's memory); measure max rows per
    // reducer under both shuffle keys
    def maxReducerRows(keys: Column*): Long =
      ev.repartition(32, keys: _*)
        .mapPartitions(it => Iterator.single(it.size))(
          org.apache.spark.sql.Encoders.scalaInt)
        .toDF("n").agg(max(col("n"))).first().getInt(0).toLong
    val naiveMax = maxReducerRows(col("user_id"))
    val saltedMax = maxReducerRows(col("user_id"), pmod(hash(col("value")), lit(NSalts)))
    println(s"""{"op":"distinct_reducer_rows","naive_max":$naiveMax,"salted_max":$saltedMax}""")
    // exactness: the salted plan must agree with the naive one
    val diff = saltedDistinctPerUser(ev).as("s")
      .join(naiveDistinctPerUser(ev).as("n"), Seq("user_id"))
      .filter(col("s.n_distinct") =!= col("n.n_distinct")).count()
    println(s"""{"op":"distinct_salted_check","mismatches":$diff}""")

    // 3. funnel under the hot user (q47's documented worst case: one
    // user owns ~20 % of events, so one task sorts+folds that whole
    // slice). Measured against the k-sequential-conditional-aggregate
    // fallback (the oracle's shape: k co-partitioned shuffles, O(1)
    // state per user) on the SAME data — and both must agree exactly.
    val steps = operators.EventAnalytics.FunnelSteps
    def funnelFold() = operators.EventAnalytics.funnel(
      evJ, steps, col("user_id"), col("ts"), col("event_type"))
    def kAggCounts(): Seq[Long] = {
      val base = evJ.filter(col("event_type").isin(steps: _*))
        .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_type"))
      var reached = base.filter(col("event_type") === steps.head)
        .groupBy("user_id").agg(min(col("t")).as("at"))
      val out = scala.collection.mutable.Buffer(reached.count())
      steps.drop(1).foreach { s =>
        reached = base.filter(col("event_type") === s)
          .join(reached, "user_id")
          .filter(col("t") > col("at"))
          .groupBy("user_id").agg(min(col("t")).as("at"))
        out += reached.count()
      }
      out.toSeq
    }
    funnelFold().write.format("noop").mode("overwrite").save() // warmup
    time("funnel_fold_hot_user")(funnelFold())
    val tK0 = System.nanoTime()
    val kCounts = kAggCounts()
    val kSec = (System.nanoTime() - tK0) / 1e9
    println(f"""{"op":"funnel_kagg_hot_user","sec":$kSec%.2f}""")
    val foldCounts = funnelFold().orderBy("stage").collect().map(_.getLong(1)).toSeq
    println(s"""{"op":"funnel_skew_check","agree":${foldCounts == kCounts},""" +
      s""""fold":${foldCounts.mkString("[", ",", "]")},"kagg":${kCounts.mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
