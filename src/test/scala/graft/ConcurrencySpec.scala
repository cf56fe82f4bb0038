package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

/** A served engine runs queries CONCURRENTLY on one session. The shared
  * surfaces with concurrency exposure — temp-view registration (q32), the
  * memoized bucketed/sharded materializations (q31/q1), call-scoped caches
  * (q19), the injected SQL functions — must produce serial-identical
  * results under parallel execution. */
class ConcurrencySpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val names = Seq("q1_sharded_scan", "q32_sql_merge",
    "q31_bucketed_merge", "q19_minhash_neardup", "q12_lww_udaf",
    "q39_sessionize", "q34_range_bucket", "q38_cosine_neardup",
    "q53_corpus_to_batches",
    // round-7 continuation: the injected zorder_key function and the
    // chunk/quantize map-only paths under parallel execution
    "q57_zorder_key", "q54_chunks", "q58_vec_quantize",
    // round-7 closing ops: the injected bloom functions (q61), ccStar's
    // per-round localCheckpoints (q60), and the broadcast totals (q64)
    "q60_neardup_clusters", "q61_bloom_dedup", "q62_source_report",
    "q63_clf_score", "q64_mix_plan",
    // round-8: the memoized IVF index layout (concurrent first probes must
    // block on ONE build) and the once-per-session streaming-replay store
    // (q67_stream_merge held this slot until its r17 retirement; q83 runs
    // the same JSONL replay scaffold across TWO query incarnations over
    // one checkpoint — a strictly larger concurrent-memoization surface)
    "q66_ivf_topk", "q83_stream_restart",
    // round-9: the broadcast-query LSH probe (q68), the memoized z-ordered
    // layout (q69 — concurrent first probes must block on ONE ETL write),
    // and the once-per-session streaming dedup-store replay (q70)
    "q68_lsh_topk", "q69_zorder_probe", "q70_stream_dedup",
    // round-10: the recall gate (q71) fans out over BOTH memoized layouts
    // (IVF index + exact/LSH kernels) inside one plan — the heaviest
    // concurrent consumer of the shared memoization surfaces
    "q71_ann_recall",
    // round-12: the salted join (per-partition-seeded rand salt must be
    // deterministic under concurrent execution) and the memoized TSV
    // export (concurrent first reads must block on ONE writeTsv)
    "q72_salted_join", "q73_tsv_roundtrip",
    // round-13: the once-per-session streaming sessionization replay
    // (concurrent first calls must block on ONE readStream run),
    // PageRank's per-iteration localCheckpoints under parallel execution,
    // and the memoized bloom-index ingest (the index MUTATES — concurrent
    // first calls must block on ONE build+append run)
    // (q75_pagerank held this slot until its r16 retirement; q81 runs the
    // same per-iteration localCheckpoint loop over the bucketed table AND
    // adds the memoized bucketed-edge-table build to the concurrency
    // surface)
    "q74_stream_sessions", "q81_pagerank_bucketed", "q76_bloom_index_dedup")

  private def run(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq

  test("gate queries return serial-identical results under concurrent " +
    "execution on one shared session") {
    val serial = names.map(n => n -> run(n)).toMap
    val pool = Executors.newFixedThreadPool(names.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // two interleaved waves of every query, all in flight at once
      val futs = (1 to 2).flatMap(_ =>
        names.map(n => Future(n -> run(n))))
      val results = Await.result(
        Future.sequence(futs), 5.minutes)
      results.foreach { case (n, r) =>
        assert(r == serial(n), s"$n diverged under concurrent execution")
      }
    } finally { pool.shutdown(); () }
  }
}
