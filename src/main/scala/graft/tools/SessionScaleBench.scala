package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.{LocalSession, TripleStore}
import graft.operators.Relational
import graft.streaming.SessionReplay

/** Streaming sessionization at the reference's row scale — the third
  * streaming operator's same-scale rehearsal (LWW sinks have ScaleBench's
  * stream sections, dedup has DedupScaleBench; sessions had only sf0.1).
  *
  * The sf events table is replicated `reps`× with per-rep user-id offsets
  * (distinct user populations, SAME time domain), exported as `NumSlices`
  * time-range JSONL files and replayed through the REAL
  * [[StreamingSessions.sessionize]] query (`maxFilesPerTrigger=1`, file
  * mtimes ascending — q74's replay shape at 100× the rows). What 100 TB
  * needs and local[32] can't show at gate scale:
  *
  *   - THROUGHPUT: events/s through `flatMapGroupsWithState` with a real
  *     file source, state store, and parquet sink in the loop.
  *   - BOUNDED STATE: the state store must hold only each user's
  *     not-yet-closable tail — the per-batch `numRowsTotal` peak from the
  *     progress listener should sit far below the event count, because
  *     closed sessions leave state at emission (the scaladoc claim,
  *     measured). A leak (state ~ events) is the failure mode this
  *     rehearsal exists to catch.
  *
  * Prints one JSON line. Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.SessionScaleBench [reps]"
  */
object SessionScaleBench {

  private val NumSlices = 10

  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 100
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    val gap = Relational.SessionGapMs
    val raw = TripleStore.table(spark, sfDir, "events")
    val ev = raw.select(col("user_id"), col("event_id"),
      Relational.eventTsMs(raw).as("ts_ms"), col("value"))
    // distinct user population per rep (offsets far above real ids), same
    // time domain — so the watermark closes every rep's sessions in step
    // materialized ONCE: each of the per-slice exports below would
    // otherwise recompute the full crossJoin from scratch (~11 redundant
    // materializations inflating export_sec)
    val big = ev.crossJoin(spark.range(reps).select(col("id").as("rep")))
      .select((col("user_id") + col("rep") * 10000000L).as("user_id"),
        (col("event_id") + col("rep") * 1000000000L).as("event_id"),
        col("ts_ms"), col("value"))
      .localCheckpoint(true)
    val nEvents = big.count()
    val (loTs, hiTs) = ev.agg(min(col("ts_ms")), max(col("ts_ms")))
      .as[(Long, Long)].head()
    val span = hiTs - loTs + 1

    val base = Files.createTempDirectory("graft_sess_scale").toString
    // shutdown-hook cleanup (the repo's replay idiom, PageRankScaleBench's
    // r15 fix applied here too): at reps=1000 the slice JSONL + store +
    // checkpoint under this dir total ~15 GB — a leak per rehearsal
    sys.addShutdownHook {
      graft.streaming.StreamingLww.deleteRecursively(new java.io.File(base))
    }
    val (src, storePath, ckpt) = (s"$base/in", s"$base/store", s"$base/ckpt")
    // the gate's replay protocol (graft.streaming.SessionReplay), with the
    // export going through Spark at this row count: one COALESCED JSONL
    // file per time slice, so no intra-slice file ordering can strand
    // early events behind the watermark
    val placer = new SessionReplay.Placer(src)
    val tEx0 = System.nanoTime()
    (0 until NumSlices).foreach { i =>
      val (lo, hi) =
        (loTs + span * i / NumSlices, loTs + span * (i + 1) / NumSlices)
      val tmp = s"$base/slice$i"
      big.filter(col("ts_ms") >= lo && col("ts_ms") < hi)
        .coalesce(1).write.json(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .filter(p => p.contains("part-") && p.endsWith(".json"))
      require(part.length == 1, s"expected 1 part file in $tmp")
      val dst = Paths.get(src, f"slice$i%02d.json")
      Files.move(Paths.get(part.head), dst, StandardCopyOption.ATOMIC_MOVE)
      placer.stamp(dst)
    }
    SessionReplay.placeSentinels(placer, hiTs, gap)
    val tExport = (System.nanoTime() - tEx0) / 1e9

    // per-batch state-store size from the progress stream
    val maxState = new java.util.concurrent.atomic.AtomicLong(0)
    val maxStateMem = new java.util.concurrent.atomic.AtomicLong(0)
    val nBatches = new java.util.concurrent.atomic.AtomicLong(0)
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        nBatches.incrementAndGet()
        e.progress.stateOperators.foreach { s =>
          maxState.getAndUpdate(m => math.max(m, s.numRowsTotal))
          maxStateMem.getAndUpdate(m => math.max(m, s.memoryUsedBytes))
        }
        ()
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    val t0 = System.nanoTime()
    SessionReplay.run(spark, src, gap, watermarkDelay = "10 minutes",
      storePath, ckpt)
    val tStream = (System.nanoTime() - t0) / 1e9

    val closed = spark.read.parquet(storePath)
      .filter(!(col("user_id") <=> lit(SessionReplay.SentinelUser)))
    val nSessions = closed.count()
    val nUsers = closed.select("user_id").distinct().count()
    def f(v: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    println(s"""{"metric":"session_scale","events":$nEvents,"reps":$reps,""" +
      s""""slices":$NumSlices,"export_sec":${f(tExport)},""" +
      s""""stream_sec":${f(tStream)},""" +
      s""""events_per_sec":${f(nEvents / tStream)},""" +
      s""""sessions":$nSessions,"users":$nUsers,""" +
      s""""max_state_rows":${maxState.get},""" +
      s""""max_state_bytes":${maxStateMem.get},"batches":${nBatches.get},""" +
      s""""state_keys_to_users":${f(maxState.get.toDouble /
        math.max(1L, nUsers))}}""")
    spark.stop()
  }
}
