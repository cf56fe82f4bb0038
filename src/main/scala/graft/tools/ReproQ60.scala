package graft.tools

import org.apache.spark.sql.SparkSession

/** Temporary repro harness for the r10 driver-side q60 ClassCastException.
  * Runs q60 in a loop (same session shape as Bench/Verify) until it throws,
  * then prints the full stack trace. Deleted once the root cause is fixed.
  */
object ReproQ60 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val iters = if (args.length > 1) args(1).toInt else 30
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    var i = 0
    var failed = false
    while (i < iters && !failed) {
      i += 1
      val t0 = System.nanoTime()
      try {
        graft.SparkEntry.queries("q60_neardup_clusters")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"iter $i ok ${(System.nanoTime() - t0) / 1e9}%.2f s")
      } catch {
        case e: Throwable =>
          println(s"iter $i FAILED: ${e.getClass.getName}: ${e.getMessage}")
          e.printStackTrace()
          failed = true
      }
    }
    if (!failed) println(s"all $iters iterations passed")
    spark.stop()
  }
}
