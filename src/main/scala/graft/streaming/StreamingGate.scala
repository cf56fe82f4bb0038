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

  /** Number of JSONL files the changelog is split into = number of
    * micro-batches the merge replays (maxFilesPerTrigger = 1). */
  private val NumBatches = 4

  def q67StreamMerge(spark: SparkSession, dir: String): DataFrame = {
    val store = ran.computeIfAbsent(dir, { _ =>
      val base = Files.createTempDirectory("graft_stream_gate").toString
      val src = s"$base/in"
      val storePath = s"$base/store"
      val ckpt = s"$base/ckpt"
      // seed: the local store (q3's left side)
      TripleStore.triples(spark, dir)
        .write.parquet(storePath)
      // the wire: remote changelog as JSONL files, several so the stream
      // actually micro-batches (repartition count = batch count)
      TripleStore.writeJsonl(
        TripleStore.remoteChangelog(spark, dir).repartition(NumBatches), src)
      val q = StreamingLww.mergeIntoStore(
        StreamingLww.jsonlSource(spark, src, maxFilesPerTrigger = 1),
        storePath, ckpt, Trigger.AvailableNow())
      q.awaitTermination()
      assert(Files.exists(Paths.get(storePath)), "streaming merge left no store")
      storePath
    })
    spark.read.parquet(store).orderBy("subject", "predicate")
  }

  private val ranDedup =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Q70: the exact-dedup pillar driven through an ACTUAL streaming query —
    * q67's pattern applied to [[StreamingDedup.mergeIntoDedupStore]]. The
    * documents table is exported as JSONL (doc_id, text), split into
    * [[NumBatches]] files, and replayed through `readStream`
    * (`maxFilesPerTrigger=1`, so the dedup-store merge really runs
    * incrementally); the final store is compared against q18's oracle —
    * valid for ANY chopping/arrival order because the store merge is
    * (min, sum): associative and commutative (StreamingDedupSpec pins the
    * equivalence in-process, including checkpoint-replay no-ops).
    * Memoized per sf dir, like q67. */
  def q70StreamDedup(spark: SparkSession, dir: String): DataFrame = {
    val store = ranDedup.computeIfAbsent(dir, { _ =>
      val base = Files.createTempDirectory("graft_stream_dedup").toString
      val src = s"$base/in"
      val storePath = s"$base/store"
      val ckpt = s"$base/ckpt"
      TripleStore.table(spark, dir, "documents")
        .select("doc_id", "text")
        .repartition(NumBatches)
        .write.json(src)
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .option("mode", "FAILFAST")
        .json(src)
      val q = StreamingDedup.mergeIntoDedupStore(stream, storePath, ckpt)
      q.awaitTermination()
      assert(Files.exists(Paths.get(storePath)),
        "streaming dedup left no store")
      storePath
    })
    spark.read.parquet(store).orderBy("content_hash")
  }
}
