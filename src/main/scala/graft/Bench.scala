package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        sys.props("java.io.tmpdir") + "/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup outside the timings: JVM/codegen/parquet-footer startup (else
    // the alphabetically-first query absorbs ~3 s of it) and the one-off
    // sharded materialization (an ETL write, not per-lookup cost — the
    // reference's baseline times lookups on an already-loaded store).
    spark.read.parquet(s"$sfDir/region.parquet").count()
    TripleStore.shardedPath(spark, sfDir)
    // (name, seconds, errorOrNull) — a failed query must be visibly failed,
    // not recorded as the round's fastest time. Per-query MEDIAN of 3 runs:
    // single-shot times at this scale carry ±0.1 s of JIT/GC noise, which
    // round-over-round comparisons would read as regressions.
    val runs = 3
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val timed = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val err =
          // noop sink, NOT count(): under a count the optimizer prunes the
          // final projection (a fingerprint query would be timed without
          // computing its fingerprints); the noop write materializes every
          // output row, which is what the reference's HTTP responses pay
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            None
          }
          catch { case e: Throwable => Some(e.getClass.getSimpleName) }
        ((System.nanoTime() - t0) / 1e9, err)
      }
      val err = timed.flatMap(_._2).headOption
      // median over SUCCESSFUL runs only — a fast abort must not drag the
      // median down; if every run failed, fall back to all runs so the
      // entry still carries a (visibly-errored) time
      val times = {
        val ok = timed.collect { case (t, None) => t }
        if (ok.nonEmpty) ok else timed.map(_._1)
      }
      (name, times.sorted.apply(times.size / 2), err)
    }
    def js(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val qs = results.map { case (k, v, _) => s"${js(k)}:$v" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"${js(k)}:${js(e)}" }
      .mkString("{", ",", "}")
    val ok = results.filter(_._3.isEmpty)
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"n_ok":${ok.size},"n_err":${results.size - ok.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
