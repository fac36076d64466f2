package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.{Event, EventStreams}

/** Streaming soak (round-4 verdict item 8; round-12 widens it): drive
  * the STATEFUL shapes — q31 sessionization, q38's stream-stream
  * interval join, and the four newer flatMapGroupsWithState twins (q47
  * funnel, q49 transitions, q53 anomaly ring, q58 silences) — all under
  * the RocksDB state-store provider, from a rate-limited source for
  * minutes of wall time, recording the state-store row count per
  * progress tick. The claim under test: state PLATEAUS (at the
  * watermark horizon, the active-key cardinality, or the completion
  * eviction — each operator's documented bound) instead of growing
  * with events processed — the invariant a long-lived 100 TB streaming
  * job stands on.
  *
  * Event time is synthetic and ACCELERATED (each rate-source row
  * advances it 100 ms × rows/sec ≈ 200× wall speed), so hour-scale
  * watermark/gap horizons expire within a minutes-long soak — the
  * compression changes no operator code, only the clock density.
  *
  * Usage: `sbt "runMain graft.SoakProbe [seconds] [rowsPerSecond]"`.
  * Prints one JSON line per sample plus a final plateau verdict row
  * for SCALE.md.
  */
object SoakProbe {

  private val NUsers = 1000L

  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(180)
    val rps = args.drop(1).headOption.map(_.toInt).getOrElse(2000)
    val spark = GraftEngine.session(GraftConfig(
      master = "local[8]", appName = "graft-soak", shufflePartitions = 8))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    implicit val s: SparkSession = spark

    // rate source → events: user cycles over NUsers; event time advances
    // 100 ms per row (≈ 200× wall at 2000 rows/s). Event types cycle
    // view → click → purchase per user-event index, so every user walks
    // the q47 funnel IN ORDER and completes it every third event — the
    // completion-eviction path is exercised continuously, and the
    // click/purchase rows still feed the q38 join.
    def events = spark.readStream.format("rate")
      .option("rowsPerSecond", rps).load()
      .select(col("value").as("event_id"),
        to_timestamp(lit(1704067200L) + col("value") * 0.1).as("ts"),
        (col("value") % NUsers).as("user_id"),
        element_at(
          array(lit("view"), lit("click"), lit("purchase")),
          ((col("value") / NUsers) % 3).cast("int") + 1).as("event_type"),
        (col("value") % 97).cast("double").as("value"))

    val ckpt = java.nio.file.Files.createTempDirectory("graft_soak").toString

    // q31 shape: sessionization, 30-min gap ≈ 9 wall-seconds of event time
    val sessions = EventStreams.sessionize(events.as[Event], watermark = "60 seconds")
      .writeStream.format("noop").option("checkpointLocation", s"$ckpt/sess")
      .outputMode("append").start()

    // q38 shape: interval join, 10-min join window + 60 s watermark
    val join = EventStreams.clickPurchaseJoin(
        events.filter(col("event_type") === "click"),
        events.filter(col("event_type") === "purchase"),
        watermark = "60 seconds", windowMs = 10 * 60 * 1000L)
      .writeStream.format("noop").option("checkpointLocation", s"$ckpt/join")
      .outputMode("append").start()

    // q47 shape: funnel progress — state bounded by active users, with
    // completion eviction firing every 3rd event per user
    val funnel = EventStreams.funnelProgress(events.as[Event], watermark = "60 seconds")
      .writeStream.format("noop").option("checkpointLocation", s"$ckpt/funnel")
      .outputMode("append").start()

    // q49 shape: path transitions — one LastEvent entry per user
    val transitions = EventStreams.transitionSteps(events.as[Event], watermark = "60 seconds")
      .writeStream.format("noop").option("checkpointLocation", s"$ckpt/trans")
      .outputMode("append").start()

    // q53 shape: daily-volume anomaly ring — state bounded by the event-
    // type vocabulary (3 types × an 8-long ring), volume-independent
    val anomaly = EventStreams.anomalyFacts(events.as[Event], watermark = "60 seconds")
      .writeStream.format("noop").option("checkpointLocation", s"$ckpt/anom")
      .outputMode("append").start()

    // q58 shape: silence detection keyed by event type — one long per key.
    // Each type recurs every ~300 ms of event time, so a 200 ms floor
    // emits facts continuously while state stays at |types|
    val silences = EventStreams.silenceFacts(events.as[Event],
        minGapUs = 200000L, watermark = "60 seconds")
      .writeStream.format("noop").option("checkpointLocation", s"$ckpt/sil")
      .outputMode("append").start()

    final case class Sample(sec: Long, op: String, rows: Long, bytes: Long)
    val samples = scala.collection.mutable.ArrayBuffer.empty[Sample]
    def sample(tag: String, q: StreamingQuery, t: Long): Unit =
      Option(q.lastProgress).foreach { p =>
        p.stateOperators.foreach { so =>
          val rocksBytes = Option(so.customMetrics.get("rocksdbSstFileSize"))
            .map(_.longValue()).getOrElse(so.memoryUsedBytes)
          samples += Sample(t, s"$tag/${so.operatorName}",
            so.numRowsTotal, rocksBytes)
          println(s"""{"sec":$t,"op":"$tag/${so.operatorName}","state_rows":${so.numRowsTotal},"state_bytes":$rocksBytes,"events":${p.numInputRows}}""")
        }
      }

    val t0 = System.nanoTime()
    while ((System.nanoTime() - t0) / 1e9 < seconds) {
      Thread.sleep(5000)
      val t = ((System.nanoTime() - t0) / 1e9).toLong
      sample("session", sessions, t)
      sample("join", join, t)
      sample("funnel", funnel, t)
      sample("transitions", transitions, t)
      sample("anomaly", anomaly, t)
      sample("silences", silences, t)
    }
    Seq(sessions, join, funnel, transitions, anomaly, silences).foreach(_.stop())

    // plateau verdict: for each operator, peak state rows in the middle
    // third vs the final third of the soak — bounded state means the
    // final third does not keep growing
    samples.groupBy(_.op).foreach { case (op, ss) =>
      val horizon = ss.map(_.sec).max
      def peak(lo: Double, hi: Double) = {
        val in = ss.filter(x => x.sec >= horizon * lo && x.sec <= horizon * hi)
        if (in.isEmpty) 0L else in.map(_.rows).max
      }
      val mid = peak(1.0 / 3, 2.0 / 3)
      val fin = peak(2.0 / 3, 1.0)
      val growth = if (mid == 0) Double.NaN else (fin - mid).toDouble / mid
      println(s"""{"op":"$op","peak_rows_mid":$mid,"peak_rows_final":$fin,"final_vs_mid_growth":${Bench.num(growth, 3)},"soak_sec":$horizon,"plateau":${growth < 0.2}}""")
    }
    spark.stop()
  }
}
