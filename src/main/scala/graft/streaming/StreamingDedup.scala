package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
