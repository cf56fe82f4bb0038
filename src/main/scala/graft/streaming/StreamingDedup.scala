package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Ingest-time exact deduplication — the streaming twin of the batch
  * content-hash dedup ([[graft.operators.Docs.q18ExactDedup]]). A 100 TB
  * corpus is not assembled in one batch job: it arrives as a crawl stream,
  * and dropping duplicates AT INGEST is far cheaper than storing them and
  * re-deduplicating the accumulated corpus each time.
  *
  * Shape: `dropDuplicatesWithinWatermark` on the sha-256 content hash. The
  * operator keeps ONE state row per distinct hash seen inside the watermark
  * horizon and drops that row once the watermark passes its event time —
  * bounded state, where plain `dropDuplicates` on an unbounded stream keeps
  * every key forever (state grows with corpus size = guaranteed OOM at
  * scale). The one shuffle clusters the candidate rows by hash — including
  * the text column, since the surviving row is emitted whole. At full
  * ingest scale the refinement is to run this operator over a
  * (hash, doc_id, ts) projection and let the sink's foreachBatch join the
  * winning doc_ids back to the batch's payload, so only winners' text is
  * ever fetched; the operator itself is unchanged by that split.
  *
  * Distinct from [[StreamingLww.dedupWithinWatermark]], which suppresses
  * REDELIVERY (the same row arriving twice: all columns equal): here the
  * rows are genuinely different records — different doc_id, different
  * arrival — that carry the same CONTENT, and the first one wins. Same
  * bounded-state operator underneath, different key and different contract.
  *
  * Honest semantic bound, pinned by StreamingDedupSpec: two copies separated
  * by MORE than the watermark horizon are BOTH emitted (the first copy's
  * state was already evicted). Ingest dedup at that distance is the batch
  * layer's job (q18 over the stored corpus) — the streaming operator's
  * contract is "no duplicates within the horizon", which is exactly what
  * bounded state can promise.
  */
object StreamingDedup {

  /** `docs` must be a streaming DataFrame with columns `doc_id LONG,
    * text STRING, ts TIMESTAMP`. Emits the first-arriving row per distinct
    * content hash (append mode); later copies within the watermark horizon
    * are dropped. */
  def firstSeen(docs: DataFrame, watermarkDelay: String): DataFrame =
    docs
      .withColumn("content_hash", sha2(col("text"), 256))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming crawl → persistent DEDUP STORE: each micro-batch aggregates
    * to (content_hash → min doc_id, copy count) and merges into a parquet
    * store with (min, sum) — the streaming twin of the batch q18 relation
    * and the ingest form of q52's daily-crawl increment. Both merge
    * operators are associative AND commutative, so the final store is
    * independent of how the crawl was chopped into batches or which order
    * they arrived: store ≡ [[graft.operators.Docs.q18ExactDedup]] over the
    * union of everything ingested (the equivalence StreamingDedupSpec pins
    * and gate q70 proves against q18's oracle).
    *
    * Unlike [[firstSeen]] this keeps NO streaming state — the store IS the
    * state, so nothing is watermark-evicted and copies arbitrarily far
    * apart still merge (the bound firstSeen's docstring concedes does not
    * apply here). The cost is a store rewrite per batch; at 100 TB the
    * refinement is [[StreamingLww.mergeIntoStorePartitioned]]'s shape —
    * hash-range-partition the store (q52's bucketed layout) and rewrite
    * only touched shards.
    *
    * The swap protocol is [[StreamingLww.mergeIntoStore]]'s
    * write-new-then-move with the same crash recovery. One extra guard the
    * LWW sink does not need: `sum(n_copies)` is NOT idempotent (LWW's
    * strict-`>` merge is), so the store carries an `_applied_upto` marker
    * (underscore-prefixed: invisible to the parquet reader) recording the
    * last merged batch id, swapped atomically WITH the data — a checkpoint
    * replay of an already-applied batch is a no-op instead of a double
    * count. The marker is scoped to the STREAM's identity — the query id
    * Structured Streaming persists in the checkpoint's `metadata` file:
    * batch ids restart at 0 per checkpoint, so a bare id would make a NEW
    * query attached to an existing store (the next crawl generation)
    * silently discard its first batches as "replays" — a different stream
    * resets the guard instead, and only a same-checkpoint redelivery is
    * suppressed. The persisted id (not the checkpoint PATH) is the scope
    * because a checkpoint deleted and recreated at the same path is a new
    * stream with restarted batch ids: Spark mints a fresh query id in the
    * new `metadata`, while the path string would alias the two streams and
    * swallow the new one's first batches. */
  def mergeIntoDedupStore(docs: DataFrame, storePath: String,
      checkpointPath: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // resolved per batch, not at wiring time: the metadata file exists
        // only once the query has started
        applyDedupBatch(batch, storePath, batchId, streamScope(checkpointPath))
      }
      .start()

  /** The stream identity the replay guard is scoped to: the query id from
    * the checkpoint's `metadata` file (JSON `{"id":"<uuid>"}`) — stable
    * across restarts of the same checkpoint, fresh when the checkpoint is
    * recreated. Falls back to the path if the file is missing/unreadable/
    * unparseable (pre-start resolution or a hand-built test dir). Read
    * through the Hadoop `FileSystem` API, NOT `java.nio` — production
    * checkpoints live on HDFS/object stores where a local-FS read would
    * silently report "missing" and degrade every stream to the path-aliased
    * scope this id exists to avoid. */
  private[graft] def streamScope(checkpointPath: String): String =
    try {
      val meta = new org.apache.hadoop.fs.Path(checkpointPath, "metadata")
      val conf = org.apache.spark.sql.SparkSession.getActiveSession
        .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
        .map(_.sessionState.newHadoopConf())
        .getOrElse(new org.apache.hadoop.conf.Configuration())
      val fs = meta.getFileSystem(conf)
      if (fs.exists(meta)) {
        val in = fs.open(meta)
        val txt =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        """"id"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(txt)
          .map(_.group(1)).getOrElse(checkpointPath)
      } else checkpointPath
    } catch { case scala.util.control.NonFatal(_) => checkpointPath }

  /** One micro-batch's merge, exposed for direct replay testing.
    * `streamId` is the replay-guard scope — in production the owning
    * query's PERSISTED ID resolved by [[streamScope]] (never the checkpoint
    * path: a deleted-and-recreated checkpoint at the same path is a new
    * stream whose restarted batch ids a path scope would swallow). */
  private[graft] def applyDedupBatch(batch: DataFrame, storePath: String,
      batchId: Long, streamId: String): Unit = {
    val spark = batch.sparkSession
    val basePath = Paths.get(storePath)
    val old = storePath + ".old"
    val tmp = storePath + ".next"
    // crash recovery: a previous batch may have died mid-swap — restore,
    // then clear stale staging dirs (StreamingLww.mergeIntoStore protocol)
    if (!Files.exists(basePath) && Files.exists(Paths.get(old)))
      Files.move(Paths.get(old), basePath)
    StreamingLww.deleteRecursively(new java.io.File(tmp))
    StreamingLww.deleteRecursively(new java.io.File(old))
    val markerFile = basePath.resolve("_applied_upto")
    // marker format: "<streamId>\n<batchId>". A marker from a DIFFERENT
    // stream never suppresses: its batch-id sequence is unrelated. A
    // MALFORMED marker (torn write, manual edit) degrades the same way —
    // treat it as foreign (-1, nothing suppressed) rather than throwing,
    // which would permanently fail the stream on every restart.
    val applied =
      if (Files.exists(markerFile)) {
        val lines = new String(Files.readAllBytes(markerFile),
          StandardCharsets.UTF_8).split("\n", 2)
        if (lines.length == 2 && lines(0) == streamId)
          scala.util.Try(lines(1).trim.toLong).getOrElse(-1L)
        else -1L
      } else -1L
    if (batchId <= applied)
      // suppression must be OBSERVABLE: if the guard ever misfires (e.g. a
      // scope collision), a silent no-op reads as data loss with no trace
      System.err.println(s"[graft.StreamingDedup] batch $batchId <= applied " +
        s"$applied for stream $streamId: replay suppressed at $storePath")
    else {
      val agg = batch
        .withColumn("content_hash", sha2(col("text"), 256))
        .groupBy("content_hash")
        .agg(min(col("doc_id")).as("rep_doc_id"),
          count(lit(1)).as("n_copies"))
      val merged =
        if (Files.exists(basePath))
          spark.read.parquet(storePath).unionByName(agg)
            .groupBy("content_hash")
            .agg(min(col("rep_doc_id")).as("rep_doc_id"),
              sum(col("n_copies")).as("n_copies"))
        else agg
      merged.write.mode(SaveMode.Overwrite).parquet(tmp)
      Files.write(Paths.get(tmp).resolve("_applied_upto"),
        s"$streamId\n$batchId".getBytes(StandardCharsets.UTF_8))
      if (Files.exists(basePath)) Files.move(basePath, Paths.get(old))
      Files.move(Paths.get(tmp), basePath)
      StreamingLww.deleteRecursively(new java.io.File(old))
      ()
    }
  }
}
