package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.TripleStore

/** Q67: the anti-entropy merge driven through an ACTUAL streaming query —
  * the gate entry that closes the loop StreamingLwwSpec proves in-process.
  *
  * The remote changelog (`MasterServer.py:384-432`'s per-round payload) is
  * exported in the reference's JSONL wire format, split into several files,
  * and replayed through `readStream` → [[StreamingLww.mergeIntoStore]]
  * (micro-batched by `maxFilesPerTrigger=1`, so the LWW merge really runs
  * incrementally) into a store seeded with the local triples. The final
  * store is returned for the driver's hash compare against the SAME oracle
  * as q3/q31/q32 (SparkEntry.MergeOracleSql) — valid because chunked LWW
  * merge ≡ one-shot merge here: the comparator is associative/commutative
  * (LwwSpec's CRDT laws) and the changelog carries at most one row per
  * logical key (every 3rd order's `<hasStatus>`), so no within-stream tie
  * can interact with the store's local-wins prio across batch boundaries.
  *
  * Memoized per sf dir (the streaming job runs once per JVM, like q28's
  * reshard); repeated calls re-read the merged store only.
  */
object StreamingGate {

  private val ran =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val ranDedup =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Number of wire files the batch relation is split into = number of
    * micro-batches each replay runs (maxFilesPerTrigger = 1). */
  private val NumBatches = 4

  /** The shared once-per-JVM replay scaffold both gate rows use: stage a
    * temp (in, store, ckpt) trio, run the export + streaming query to
    * completion, memoize the merged store path per sf dir (computeIfAbsent:
    * concurrent first calls block on ONE replay). Only the export and the
    * sink vary between q67 and q70. */
  private def replayOnce(map: java.util.concurrent.ConcurrentHashMap[String, String],
      dir: String, prefix: String)(
      run: (String, String, String) => Unit): String =
    map.computeIfAbsent(dir, { _ =>
      val base = Files.createTempDirectory(prefix).toString
      val storePath = s"$base/store"
      run(s"$base/in", storePath, s"$base/ckpt")
      assert(Files.exists(Paths.get(storePath)), s"$prefix replay left no store")
      storePath
    })

  def q67StreamMerge(spark: SparkSession, dir: String): DataFrame = {
    val store = replayOnce(ran, dir, "graft_stream_gate") {
      (src, storePath, ckpt) =>
        // seed: the local store (q3's left side)
        TripleStore.triples(spark, dir)
          .write.parquet(storePath)
        // the wire: remote changelog as JSONL files, several so the stream
        // actually micro-batches (repartition count = batch count)
        TripleStore.writeJsonl(
          TripleStore.remoteChangelog(spark, dir).repartition(NumBatches), src)
        StreamingLww.mergeIntoStore(
            StreamingLww.jsonlSource(spark, src, maxFilesPerTrigger = 1),
            storePath, ckpt, Trigger.AvailableNow())
          .awaitTermination()
    }
    spark.read.parquet(store).orderBy("subject", "predicate")
  }

  /** Q70: the exact-dedup pillar driven through an ACTUAL streaming query —
    * q67's pattern applied to [[StreamingDedup.mergeIntoDedupStore]]. The
    * documents table is exported as JSONL (doc_id, text), split into
    * [[NumBatches]] files, and replayed through `readStream`
    * (`maxFilesPerTrigger=1`, so the dedup-store merge really runs
    * incrementally); the final store is compared against q18's oracle —
    * valid for ANY chopping/arrival order because the store merge is
    * (min, sum): associative and commutative (StreamingDedupSpec pins the
    * equivalence in-process, including checkpoint-replay no-ops). */
  def q70StreamDedup(spark: SparkSession, dir: String): DataFrame = {
    val store = replayOnce(ranDedup, dir, "graft_stream_dedup") {
      (src, storePath, ckpt) =>
        TripleStore.table(spark, dir, "documents")
          .select("doc_id", "text")
          .repartition(NumBatches)
          .write.json(src)
        val stream = spark.readStream
          .schema("doc_id LONG, text STRING")
          .option("maxFilesPerTrigger", 1)
          .option("mode", "FAILFAST")
          .json(src)
        StreamingDedup.mergeIntoDedupStore(stream, storePath, ckpt)
          .awaitTermination()
    }
    spark.read.parquet(store).orderBy("content_hash")
  }
}
