package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Lww
import graft.streaming.StreamingLww

/** SURVEY §5's batch-equivalence oracle for Q11: streaming LWW state after
  * consuming all updates must equal the batch kernel on the same rows, with
  * rows arriving out of order and across micro-batches (the reference's
  * async per-node update buffering, `MongoDBConnector.py:23,76`). */
class StreamingLwwSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val batch1 = Seq(
    Triple("<a>", "<p>", "v1", 100L),
    Triple("<b>", "<p>", "v1", 100L),
    Triple("<a>", "<p>", "v2", 300L))
  private val batch2 = Seq(
    Triple("<a>", "<p>", "LATE", 200L),   // late arrival: must lose to v2
    Triple("<b>", "<p>", "v2", 400L),
    Triple("<c>", "<q>", "new", 50L))

  test("stream state == batch LWW winners on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Triple]
    val q = StreamingLww.winners(source.toDS())
      .writeStream.format("memory").queryName("lww_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      source.addData(batch1: _*); q.processAllAvailable()
      source.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    // The update-mode memory sink retains superseded emissions; final state
    // per key is its latest winner, i.e. the per-key LWW max of what was
    // emitted (reapplying LWW to its own output is exactly idempotence).
    val streamed = spark.table("lww_stream").as[Triple].collect()
      .groupBy(t => (t.subject, t.predicate))
      .map(_._2.maxBy(t => (t.ts_ms, t.`object`))).toSet

    // Batch twin: empty base upserted with every row seen by the stream.
    val batch = Lww.upsert(
        Seq.empty[Triple].toDF("subject", "predicate", "object", "ts_ms"),
        (batch1 ++ batch2).toDF("subject", "predicate", "object", "ts_ms"))
      .as[Triple].collect().toSet

    assert(streamed == batch)
    assert(streamed == Set(
      Triple("<a>", "<p>", "v2", 300L),
      Triple("<b>", "<p>", "v2", 400L),
      Triple("<c>", "<q>", "new", 50L)))
  }

  test("foreachBatch merge sink: store converges to the batch LWW result " +
    "across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink")
    val storePath = dir.resolve("store").toString
    val ckpt = dir.resolve("ckpt").toString
    val source = MemoryStream[Triple]
    source.addData(batch1: _*)
    val q1 = StreamingLww.mergeIntoStore(source.toDS(), storePath, ckpt)
    q1.awaitTermination() // AvailableNow: drains what's there, then stops
    source.addData(batch2: _*)
    val q2 = StreamingLww.mergeIntoStore(source.toDS(), storePath, ckpt)
    q2.awaitTermination()

    val store = spark.read.parquet(storePath).as[Triple].collect().toSet
    val batch = Lww.upsert(
        Seq.empty[Triple].toDF("subject", "predicate", "object", "ts_ms"),
        (batch1 ++ batch2).toDF("subject", "predicate", "object", "ts_ms"))
      .as[Triple].collect().toSet
    assert(store == batch)
  }

  test("merge sink crash recovery: a store stranded at '.old' mid-swap is " +
    "restored before the next batch merges") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_crash")
    val storePath = dir.resolve("store").toString
    val ckpt = dir.resolve("ckpt").toString
    val source = MemoryStream[Triple]
    source.addData(batch1: _*)
    StreamingLww.mergeIntoStore(source.toDS(), storePath, ckpt)
      .awaitTermination()
    // simulate dying between the two swap moves: base gone, .old present
    java.nio.file.Files.move(java.nio.file.Paths.get(storePath),
      java.nio.file.Paths.get(storePath + ".old"))
    source.addData(batch2: _*)
    StreamingLww.mergeIntoStore(source.toDS(), storePath, ckpt)
      .awaitTermination()
    val store = spark.read.parquet(storePath).as[Triple].collect().toSet
    // batch1's state must have survived the simulated crash
    assert(store == Set(
      Triple("<a>", "<p>", "v2", 300L),
      Triple("<b>", "<p>", "v2", 400L),
      Triple("<c>", "<q>", "new", 50L)))
  }

  test("tumbling windows with watermark == batch groupBy on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int, sec: Int) =
      Timestamp.valueOf(f"2026-01-01 00:$min%02d:$sec%02d")
    val rows = Seq(
      (ts(0, 10), "click", 1.0), (ts(0, 50), "click", 2.0),
      (ts(1, 5), "click", 4.0), (ts(1, 30), "view", 8.0),
      (ts(3, 0), "click", 16.0))

    val source = MemoryStream[(Timestamp, String, Double)]
    val q = StreamingLww.tumblingCounts(
        source.toDS().toDF("ts", "event_type", "value"), "2 minutes")
      .writeStream.format("memory").queryName("tumbling_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      source.addData(rows: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("tumbling_stream")
      .select(col("window.start"), col("event_type"), col("cnt"),
        col("sum_value"))
      .as[(Timestamp, String, Long, Double)].collect().toSet

    val batch = StreamingLww.tumblingCounts(
        rows.toDF("ts", "event_type", "value"), "2 minutes")
      .select(col("window.start"), col("event_type"), col("cnt"),
        col("sum_value"))
      .as[(Timestamp, String, Long, Double)].collect().toSet

    assert(streamed == batch)
    assert(streamed.size == 4)
  }
}
