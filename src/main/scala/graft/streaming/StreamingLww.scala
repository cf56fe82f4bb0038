package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}

import graft.Triple
import graft.operators.Lww

/** Q11: the reference's asynchronous LWW exchange as Structured Streaming.
  *
  * In the reference, updates arrive per node, buffer in
  * `updateModifications` (`MongoDBConnector.py:23,76`), ship lazily, and
  * apply with a timestamp comparison so stale arrivals lose
  * (`MongoDBConnector.py:150-153`) — i.e. late-data-tolerant LWW upsert
  * state. Here the updates stream feeds `mapGroupsWithState` keyed by the
  * logical key `(subject, predicate)`; the per-key state is the current
  * winner and the update function is the same `(ts_ms, object)` max as the
  * batch kernel, so stream state ≡ batch [[graft.operators.Lww]] on the same
  * rows (asserted in StreamingLwwSpec — SURVEY §5's batch-equivalence
  * oracle).
  *
  * Scale note: per-key state is ONE row (not a buffer of inputs), and the
  * 100 TB story remains batch LWW compaction (SURVEY §7.3) — streaming state
  * is for the live tail, with watermark-driven eviction when keys are
  * time-bounded.
  */
object StreamingLww {

  private def deleteRecursively(f: java.io.File): Unit =
    if (f.exists()) {
      if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
      f.delete(); ()
    }

  /** Emit the current winner of every key touched in each micro-batch
    * (update output mode). */
  def winners(updates: Dataset[Triple]): Dataset[Triple] = {
    import updates.sparkSession.implicits._
    updates
      .groupByKey(t => (t.subject, t.predicate))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (_: (String, String), rows: Iterator[Triple],
         state: GroupState[Triple]) =>
          val w = (state.getOption.iterator ++ rows)
            .maxBy(t => (t.ts_ms, t.`object`))
          state.update(w)
          w
      }
  }

  /** Streaming changelog → persistent store: each micro-batch LWW-merges
    * into the parquet store via `foreachBatch` (the reference's
    * merge-orchestration loop, `MasterServer.py:384-432`, as a sink). The
    * default trigger processes batches as they arrive; pass
    * `Trigger.ProcessingTime("5 seconds")` for the reference's 5 s
    * anti-entropy cadence (`MasterServer.py:233`).
    *
    * The store swap is write-new-then-move (never read and overwrite the
    * same files in one job). At 100 TB the overwrite-the-store compaction
    * becomes partition-wise: merge only the range shards the batch's key
    * bounds touch (see `ScaleBench`'s bounded merge) or use a
    * MERGE-capable table format; the foreachBatch structure is unchanged.
    */
  def mergeIntoStore(updates: Dataset[Triple], storePath: String,
      checkpointPath: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val spark = updates.sparkSession
    updates.writeStream
      .outputMode("update")
      .trigger(trigger)
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[Triple], _: Long) =>
        val basePath = Paths.get(storePath)
        val old = storePath + ".old"
        val tmp = storePath + ".next"
        // crash recovery: a previous batch may have died mid-swap. If the
        // store is gone but .old survives, the crash hit between the two
        // moves — restore it; then clear any stale .next/.old so this
        // batch starts from a clean swap state.
        if (!Files.exists(basePath) && Files.exists(Paths.get(old)))
          Files.move(Paths.get(old), basePath)
        deleteRecursively(new java.io.File(tmp))
        deleteRecursively(new java.io.File(old))
        val base =
          if (Files.exists(basePath))
            spark.read.parquet(storePath)
          else batch.limit(0).toDF()
        // merge (strict->) not upsert: a stale arrival must lose to the
        // store's newer row (MongoDBConnector.py:150-153), and batch
        // retries (same rows redelivered) are then no-ops — idempotent.
        Lww.merge(base, batch.toDF())
          .write.mode(SaveMode.Overwrite).parquet(tmp)
        // swap; recovery above makes a crash between the moves survivable
        if (Files.exists(basePath))
          Files.move(basePath, Paths.get(old))
        Files.move(Paths.get(tmp), basePath)
        deleteRecursively(new java.io.File(old))
        ()
      }
      .start()
  }

  /** Q11 tumbling 1-minute windows with a watermark over an event stream
    * (`ts` must be TimestampType). The watermark bounds state: windows older
    * than it are finalized and evicted, the Spark analog of the reference's
    * 5 s health/merge cadence bounding staleness (`MasterServer.py:233`). */
  def tumblingCounts(events: DataFrame, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
}
