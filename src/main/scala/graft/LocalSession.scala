package graft

import org.apache.spark.sql.SparkSession

/** The one local session shape every runnable main shares (Bench, Verify,
  * ScaleBench, tools) — a single definition so a session-level fix (conf,
  * comment, extension) cannot silently miss one copy. Test suites use
  * `SparkTestSession` (same confs, 4 threads) instead. */
object LocalSession {

  /** `local[cpus]` session with the engine extensions and the confs the
    * gate queries rely on; log level WARN (keeps INFO noise out of the
    * output whose tail a harness may capture). */
  def create(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // older testdata generations carry timestamp[ns] events; surface
      // those as raw ns longs (eventTsMs's LongType branch) instead of
      // aborting the read — a no-op on the timestamp[us] generation
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // q31's bucketed tables are catalog tables; keep their managed
      // locations out of the repo working tree
      .config("spark.sql.warehouse.dir",
        sys.props("java.io.tmpdir") + "/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
