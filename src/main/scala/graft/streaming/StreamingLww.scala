package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.Triple

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
