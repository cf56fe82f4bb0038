package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** One-off measurement: [[Graph.pageRank]] at store scale (~10M edges) —
  * the graph north star's same-scale rehearsal, CcModeBench's discipline
  * applied to the iterative rank loop. Two modes over identical input:
  *
  *   - `plain`: the edge list as derived — every iteration's src-join
  *     re-shuffles the (big) edge side.
  *   - `prepart`: edges hash-repartitioned on `src` ONCE and checkpointed —
  *     `LogicalRDD` preserves the partitioning, so each iteration's
  *     src-join reuses it and only the (smaller) rank side moves. This is
  *     the scaladoc's "pre-partitioned edge table keeps the big side
  *     exchange-free" claim, measured instead of argued. (r13 result: the
  *     compile-time Exchange is NOT elided — the win is cheaper shuffling
  *     of clustered rows, ~23% wall.)
  *   - `bucketed` (r14): edges written ONCE as a bucketBy(src) catalog
  *     table ([[Graph.writeBucketedEdges]]) and the loop run through
  *     [[Graph.pageRankBucketed]] — the scan itself carries
  *     HashPartitioning(src), so the edge-side Exchange is GONE from the
  *     compile-time tree (asserted via the contribution-subplan exchange
  *     count below), the identified-but-unshipped 100× plan win.
  *
  * All modes must agree on the ranks (max |Δ| over a full join) before
  * the numbers are reported. Prints one JSON line.
  *
  * Usage: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.PageRankScaleBench
  * [sfDir] [replicate] [iters] [modes] [input]"` — disjoint id-suffixed
  * graph copies, so the work is k× honest edges with k× honest nodes.
  * `modes` (default `plain,prepart,bucketed`) selects the comparison modes
  * to run alongside the always-run plain baseline — the 100M-edge
  * rehearsal (r15) runs `plain,bucketed` only, prepart's conclusion being
  * already on record at 10M (r13: +23% wall, no exchange elision).
  *
  * `input` (default `mem`) picks the plain baseline's edge residency:
  *   - `mem`: eager localCheckpoint, the ≤10M shape (memory-resident
  *     blocks out-serve a parquet re-scan when the relation fits in RAM).
  *   - `disk`: the replicated union written ONCE to a plain parquet dir
  *     and re-scanned per iteration via [[Graph.pageRankMaterialized]].
  *     Mandatory at 100M: the mem shape's TWO pinned 99M-edge copies
  *     (this harness's checkpoint + pageRank's internal one) OOM'd a
  *     48 GiB heap mid-loop (r15) — and disk is the honest target-scale
  *     baseline anyway, since a 100 TB edge relation is never
  *     memory-resident. `prepart` (a checkpoint-shaped mode by
  *     definition) is rejected under `disk`. */
object PageRankScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val replicate = if (args.length > 1) args(1).toInt else 60
    val iters = if (args.length > 2) args(2).toInt else 10
    val modes = (if (args.length > 3) args(3) else "plain,prepart,bucketed")
      .split(",").map(_.trim).toSet
    // a typo'd mode must fail loudly, not silently measure less than the
    // invocation asked for (and exit 0 with the elision assertion skipped)
    require(modes.subsetOf(Set("plain", "prepart", "bucketed")),
      s"unknown mode(s): ${(modes -- Set("plain", "prepart", "bucketed"))
        .mkString(",")} — valid: plain,prepart,bucketed")
    val input = if (args.length > 4) args(4) else "mem"
    require(Set("mem", "disk")(input), s"input must be mem|disk, got $input")
    require(input == "mem" || !modes("prepart"),
      "prepart is a memory-checkpoint mode; run it with input=mem")
    val spark = graft.LocalSession.create(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    val jobs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    def settled(): Long = {
      var prev = -1L; var cur = jobs.get()
      val deadline = System.currentTimeMillis() + 5000
      while (cur != prev && System.currentTimeMillis() < deadline) {
        prev = cur; Thread.sleep(50); cur = jobs.get()
      }
      cur
    }

    val base = Graph.edges(spark, sfDir)
    val unioned = (0 until replicate).map { i =>
      base.select(concat(col("src"), lit(s"#$i")).as("src"),
        concat(col("dst"), lit(s"#$i")).as("dst"))
    }.reduce(_ union _)
    val edges = input match {
      case "mem" => unioned.localCheckpoint(true)
      case "disk" =>
        // per-run unique dir + shutdown-hook cleanup (the repo's replay
        // idiom): a fixed path left a stranded ~99M-edge parquet copy per
        // rehearsal and let two concurrent invocations overwrite each
        // other's edges mid-iteration (r15 review finding)
        val path = java.nio.file.Files
          .createTempDirectory("graft_prbench_edges_").toString
        sys.addShutdownHook {
          graft.streaming.StreamingLww.deleteRecursively(
            new java.io.File(path))
        }
        unioned.write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
    }
    val nEdges = edges.count()

    // by-name rank producer so every mode shares ONE owner of the
    // measurement discipline (settled-counter window, eager checkpoint,
    // sum derivation)
    def run(mk: => org.apache.spark.sql.DataFrame) = {
      val j0 = settled()
      val t0 = System.nanoTime()
      // evaluating mk RUNS the loop (its final frame is already an eager
      // checkpoint) — a further localCheckpoint here would only copy |V|
      // rows into a second retained block set per mode (r15: that copy was
      // one of the deserialized frames that OOM'd the 100M rehearsal)
      val ranks = mk
      val secs = (System.nanoTime() - t0) / 1e9
      val j = settled() - j0
      val sum = ranks.agg(org.apache.spark.sql.functions.sum("rank"))
        .head().getDouble(0)
      (ranks, secs, j, sum)
    }

    val (rPlain, tPlain, jPlain, sPlain) = run(
      if (input == "disk") Graph.pageRankMaterialized(edges, iters)
      else Graph.pageRank(edges, iters))
    val preOpt = if (!modes("prepart")) None else {
      val pre = edges.repartition(col("src")).localCheckpoint(true)
      Some((pre, run(Graph.pageRank(pre, iters))))
    }

    // bucketed mode: one-off layout write (reported separately — it is the
    // ETL cost, paid once per corpus version like q31's bucketed store),
    // then the loop through the catalog table
    val edgeTable = "graft_prbench_edges_bkt"
    val bktOpt = if (!modes("bucketed")) None else {
      val t0 = System.nanoTime()
      Graph.writeBucketedEdges(edges, edgeTable,
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
      val tLayout = (System.nanoTime() - t0) / 1e9
      Some((tLayout, run(Graph.pageRankBucketed(spark, edgeTable, iters))))
    }

    // plan diagnostic: ONE iteration's contribution subplan per mode, so
    // the exchange count states whether the preserved partitioning elides
    // the edge-side shuffle (AQE off for a deterministic compile-time tree)
    def contribExchanges(e: org.apache.spark.sql.DataFrame): Int = {
      val prev = spark.conf.get("spark.sql.adaptive.enabled")
      val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // broadcast off: at a replicate-scale corpus nothing here broadcasts
      // anyway, and at smoke scale a broadcast plan would hide the very
      // exchange this diagnostic counts
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val ranks = rPlain
        // LAZY checkpoint: the plan is fingerprinted, never executed — an
        // eager one would materialize an extra |V|-row block per call on
        // top of the three retained rank checkpoints (the accumulation
        // pattern the r13 OOM notes warn about)
        val outDeg = e.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("out_deg")).localCheckpoint(false)
        val plan = e
          .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
          .join(outDeg.withColumnRenamed("node", "src"), Seq("src"))
          .select(col("dst").as("node"),
            (col("rank") / col("out_deg")).as("c"))
          .groupBy("node").agg(sum(col("c")).as("in_mass"))
        PlanFingerprint.fingerprint(plan).exchanges
      } finally {
        spark.conf.set("spark.sql.adaptive.enabled", prev)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      }
    }
    val exPlain = contribExchanges(edges)
    val exPre = preOpt.map { case (pre, _) => contribExchanges(pre) }
    val exBkt = bktOpt.map(_ => contribExchanges(spark.table(edgeTable)))

    // modes must agree node-for-node before any number is reported
    def diffTo(other: org.apache.spark.sql.DataFrame): Double = rPlain.as("a")
      .join(other.as("b"), col("a.node") === col("b.node"), "full_outer")
      .agg(max(abs(coalesce(col("a.rank"), lit(-1.0)) -
        coalesce(col("b.rank"), lit(-2.0)))))
      .head().getDouble(0)
    val maxDiff = (preOpt.map(p => diffTo(p._2._1)).toSeq ++
      bktOpt.map(b => diffTo(b._2._1)).toSeq).foldLeft(0.0)(math.max)
    def f(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val preJson = preOpt.map { case (_, (_, tPre, jPre, sPre)) =>
      s""""prepart_sec":${f(tPre)},"prepart_jobs":$jPre,""" +
        s""""contrib_exchanges_prepart":${exPre.get},""" +
        s""""rank_sum_prepart":${f(sPre)},"""
    }.getOrElse("")
    val bktJson = bktOpt.map { case (tLayout, (_, tBkt, jBkt, sBkt)) =>
      s""""bucketed_sec":${f(tBkt)},"bucketed_jobs":$jBkt,""" +
        s""""bucketed_layout_sec":${f(tLayout)},""" +
        s""""contrib_exchanges_bucketed":${exBkt.get},""" +
        s""""rank_sum_bucketed":${f(sBkt)},"""
    }.getOrElse("")
    println(s"""{"metric":"pagerank_scale","edges":$nEdges,"iters":$iters,""" +
      s""""input":"$input",""" +
      s""""plain_sec":${f(tPlain)},"plain_jobs":$jPlain,""" +
      preJson + bktJson +
      s""""contrib_exchanges_plain":$exPlain,""" +
      s""""rank_sum_plain":${f(sPlain)},""" +
      s""""max_rank_diff":$maxDiff}""")
    spark.stop()
    if (maxDiff > 1e-9) {
      System.err.println(s"[pagerank_scale] modes disagree: $maxDiff")
      sys.exit(1)
    }
    exBkt.filter(_ >= exPlain).foreach { e =>
      System.err.println(s"[pagerank_scale] bucketed mode elided no " +
        s"Exchange: bucketed=$e plain=$exPlain")
      sys.exit(1)
    }
  }
}
