package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import graft.{LocalSession, SparkEntry}

/** Memory-pressure rehearsal for the gate's heaviest entries (VERDICT r12
  * #3): at 100 TB, per-partition memory pressure is the NORM, and the
  * scaladoc claim that the chosen plans (SortAggregate / SMJ / external
  * sort) degrade to spill instead of OOM had never been executed. This
  * main runs the named entries under whatever heap the caller constrains
  * the JVM to (`SPARK_DRIVER_MEM=2g` — build.sbt threads it into `-Xmx`)
  * and reports, per query: wall seconds, bytes spilled to memory/disk
  * (summed over task metrics), peak single-task execution memory, and
  * completion status. A query that completes WITH spill under a starved
  * heap is the success case — the plan held; only an OOM/abort is a fail.
  *
  * Usage:
  *   SPARK_DRIVER_MEM=2g SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.tools.SpillRehearsal /root/testdata/sf0.1 \
  *          q19_minhash_neardup q33_connected_components ..."
  * Prints one JSON line per query plus a trailing summary line.
  */
object SpillRehearsal {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q3_lww_merge", "q19_minhash_neardup",
        "q33_connected_components", "q60_neardup_clusters")
    val spark = LocalSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    val memSpilled = new AtomicLong(0)
    val diskSpilled = new AtomicLong(0)
    val peakExec = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          memSpilled.addAndGet(m.memoryBytesSpilled)
          diskSpilled.addAndGet(m.diskBytesSpilled)
          peakExec.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
          ()
        }
      }
    })
    // listener bus is async — drain until quiet before snapshotting
    def settled(): (Long, Long, Long) = {
      var prev = (-1L, -1L, -1L)
      var cur = (memSpilled.get, diskSpilled.get, peakExec.get)
      val deadline = System.currentTimeMillis() + 5000
      while (cur != prev && System.currentTimeMillis() < deadline) {
        prev = cur; Thread.sleep(50)
        cur = (memSpilled.get, diskSpilled.get, peakExec.get)
      }
      cur
    }

    val heap = Runtime.getRuntime.maxMemory()
    println(s"""{"spill_rehearsal":"start","sf":"$sfDir","heap_bytes":$heap}""")
    var failures = 0
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown gate entry '$name'"))
      val (m0, d0, _) = settled()
      peakExec.set(0)
      val t0 = System.nanoTime()
      val err =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          None
        } catch { case e: Throwable => Some(e.getClass.getSimpleName) }
      val secs = (System.nanoTime() - t0) / 1e9
      val (m1, d1, pk) = settled()
      if (err.nonEmpty) failures += 1
      val secsStr =
        String.format(java.util.Locale.ROOT, "%.2f", Double.box(secs))
      println(s"""{"query":"$name","secs":$secsStr,""" +
        s""""spill_mem_bytes":${m1 - m0},"spill_disk_bytes":${d1 - d0},""" +
        s""""peak_task_exec_bytes":$pk,""" +
        s""""status":"${err.getOrElse("completed")}"}""")
    }
    println(s"""{"spill_rehearsal":"done","n_fail":$failures}""")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
