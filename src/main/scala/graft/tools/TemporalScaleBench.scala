package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.{LocalSession, TripleStore}
import graft.operators.{Relational, Temporal}

/** Temporal joins at 10M events — the last pillar without a same-scale
  * rehearsal. The sf0.1 events table replicated with per-rep user offsets
  * (disjoint populations, q45/q46's exact shapes at 100× the rows):
  *
  *   - RANGE join: events → 24 h purchase windows. The scale claim is the
  *     REPLICATION BOUND — with bucketWidth ≥ window length each interval
  *     lands in ≤ 2 time buckets, so the exchanged interval volume is
  *     ≤ 2·|intervals| regardless of span (measured via the shuffle-record
  *     listener), and the join is an equi-join Catalyst can hash — never a
  *     BroadcastNestedLoopJoin.
  *   - AS-OF join: non-purchases → newest ≤24 h-old purchase. ONE hash
  *     exchange of the tagged union (no join node at all) — the
  *     shuffle-record count must be ≤ |probe| + |build| + ε.
  *
  * Prints one JSON line. Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.TemporalScaleBench [reps]"
  */
object TemporalScaleBench {

  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 100
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    val shufRecords = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          shufRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten); ()
        }
      }
    })
    def settled(): Long = {
      var prev = -1L; var cur = shufRecords.get()
      val deadline = System.currentTimeMillis() + 5000
      while (cur != prev && System.currentTimeMillis() < deadline) {
        prev = cur; Thread.sleep(50); cur = shufRecords.get()
      }
      cur
    }
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // noop sink + Observation, NOT count(): under a count the optimizer
    // prunes unreferenced subtrees — the as-of join's whole Window node
    // vanishes (RemoveRedundantWindow) and the "benchmark" measures a
    // query the gate never ships (the Bench/ScaleBench artifact, again)
    def runAndCount(df: org.apache.spark.sql.DataFrame): Long = {
      val obs = org.apache.spark.sql.Observation()
      df.observe(obs, count(lit(1)).as("rows"))
        .write.format("noop").mode("overwrite").save()
      obs.get("rows").asInstanceOf[Long]
    }

    val windowMs = 24L * 3600 * 1000
    val raw = TripleStore.table(spark, sfDir, "events")
    val e0 = raw.select(col("user_id"), col("event_id"), col("event_type"),
      col("value"), Relational.eventTsMs(raw).as("ts_ms"))
    val e = e0.crossJoin(spark.range(reps).select(col("id").as("rep")))
      .select((col("user_id") + col("rep") * 10000000L).as("user_id"),
        (col("event_id") + col("rep") * 1000000000L).as("event_id"),
        col("event_type"), col("value"), col("ts_ms"))
      .localCheckpoint(true)
    val nEvents = e.count()
    val wins = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("win_id"),
        col("ts_ms").as("w_start"), (col("ts_ms") + windowMs).as("w_end"))
      .localCheckpoint(true)
    val nWins = wins.count()

    // range join: full q45 shape (join + per-window aggregate)
    val rangeDf = Temporal.rangeJoin(
        e.select("user_id", "event_id", "value", "ts_ms"),
        wins, Seq("user_id"), "ts_ms", "w_start", "w_end", windowMs)
      .groupBy("user_id", "win_id")
      .agg(count(lit(1)).as("n_events"),
        graft.functions.StableRound.stableRound(sum(col("value")), 2)
          .as("sum_value"))
    val r0 = settled()
    val (nRange, tRange) = timed(runAndCount(rangeDf))
    val rangeShuffled = settled() - r0

    // as-of join: full q46 shape
    val probeDf = e.filter(col("event_type") =!= "purchase")
      .select("user_id", "event_id", "event_type", "ts_ms")
    val buildDf = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ms"),
        col("event_id").as("purchase_id"),
        graft.functions.StableRound.stableRound(col("value"), 2)
          .as("purchase_value"))
    val asofDf = Temporal.asofJoin(probeDf, buildDf, Seq("user_id"),
      "ts_ms", "ts_ms", "event_id", "purchase_id",
      Seq("purchase_id", "purchase_value"), Some(windowMs))
    val a0 = settled()
    val (nAsof, tAsof) = timed(runAndCount(asofDf))
    val asofShuffled = settled() - a0

    def f(v: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    println(s"""{"metric":"temporal_scale","events":$nEvents,""" +
      s""""intervals":$nWins,"range_sec":${f(tRange)},""" +
      s""""range_rows":$nRange,"range_shuffle_records":$rangeShuffled,""" +
      s""""range_bound_2x_intervals_plus_events":${2 * nWins + nEvents},""" +
      s""""asof_sec":${f(tAsof)},"asof_rows":$nAsof,""" +
      s""""asof_shuffle_records":$asofShuffled}""")
    spark.stop()
  }
}
