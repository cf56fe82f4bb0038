package graft.tools

import graft.{LocalSession, SparkEntry}

/** One-off runner for individual gate entries — the builder's iteration
  * loop between full `graft.Verify` replays: run the named entries on one
  * sf dir, print a sample + row count + wall time each.
  *
  * Usage: `sbt "runMain graft.tools.GateProbe <sfDir> <name> [<name>...]"`
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GateProbe <sfDir> <name> [<name>...]")
    val sfDir = args(0)
    val spark = LocalSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    args.drop(1).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown gate entry '$name'; known: " +
          SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.show(10, false)
      val n = df.count()
      println(f"[probe] $name: $n rows, ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
