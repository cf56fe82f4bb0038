package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.LocalSession
import graft.operators.Vectors

/** ANN at 1M-vector cardinality — the similarity pillar's same-scale
  * rehearsal (the gate's q66/q68/q71 run on the sf embeddings table; this
  * is the cardinality where an un-indexed scan stops being an option).
  *
  * Synthetic but STRUCTURED corpus: `nClusters` well-separated centers
  * (hash-derived, deterministic), each vector = its center plus bounded
  * hash noise — so the IVF quantizer has real structure to find and
  * recall@k against the exact scan is a meaningful number, not a
  * uniform-cloud coin flip. Reports index build time (spherical k-means,
  * 3 iterations — the gate convention), exact brute-force top-k time for
  * the 5 probe queries, IVF probe time, and measured recall@10.
  *
  * Usage: SPARK_DRIVER_MEM=16g SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.tools.VectorScaleBench [rows] [k] [nprobe]"
  */
object VectorScaleBench {

  private val Dim = 64
  private val TopK = 10
  private val NumQueries = 5 // mirrors Vectors.NumQueries: vec_id < 5 probe

  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 1000000L
    val k = if (args.length > 1) args(1).toInt else 64
    val nprobe = if (args.length > 2) args(2).toInt else 4
    val spark = LocalSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // center(id % nClusters) + noise, all hash-derived: deterministic,
    // cluster-structured, and buildable without a data file
    val nClusters = k
    val vecs = spark.range(rows)
      .select(col("id").as("vec_id"), expr(
        s"""transform(sequence(0, ${Dim - 1}), j ->
           |  CAST((hash(id % $nClusters, j) % 1000) / 500.0
           |       + (hash(id, j) % 100) / 500.0 AS FLOAT))""".stripMargin)
        .as("embedding"))
      .localCheckpoint(true)
    val nVecs = vecs.count()

    // index build: spherical k-means, gate convention (3 iterations); the
    // final assignment is materialized INSIDE the timing (the iterations'
    // centroid checkpoints are already eager)
    val ((assigned, centroids), tBuild) = timed {
      val (a, c) = Vectors.ivfAssignVectors(vecs, k, iters = 3)
      (a.localCheckpoint(true), c)
    }
    val nAssigned = assigned.count()

    // exact baseline: brute-force cosine top-k for the probe queries over
    // the FULL corpus (the plan IVF exists to avoid)
    val norm = assigned.select(col("vec_id"), col("v"))
    val queries = norm.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .localCheckpoint(true)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    def exactTopk() = queries.crossJoin(norm)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(expr("aggregate(zip_with(qv, v, (a, b) -> a * b), " +
          "CAST(0 AS DOUBLE), (acc, p) -> acc + p)"), 4).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
    val (exact, tExact) = timed(exactTopk().collect())

    def ivf() = Vectors.ivfProbe(assigned, centroids, nprobe, TopK)
    val (approx, tIvf0) = timed(ivf().collect())
    val (_, tIvf1) = timed(ivf().collect())
    val (_, tIvf2) = timed(ivf().collect())
    val tIvf = Seq(tIvf0, tIvf1, tIvf2).sorted.apply(1)

    val exactSets = exact.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ivfSets = approx.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exactSets.map { case (q, ex) =>
      ivfSets.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    val recall = recalls.sum / math.max(1, recalls.size)

    def f(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"metric":"vector_scale","vectors":$nVecs,"dim":$Dim,""" +
      s""""k":$k,"nprobe":$nprobe,"indexed":$nAssigned,""" +
      s""""build_sec":${f(tBuild)},"exact_topk_sec":${f(tExact)},""" +
      s""""ivf_topk_sec":${f(tIvf)},"ivf_topk_cold_sec":${f(tIvf0)},""" +
      s""""recall_at_10":${f(recall)},"queries":${exactSets.size}}""")
    spark.stop()
    if (recall < 0.6) {
      System.err.println(s"[vector_scale] recall floor violated: $recall")
      sys.exit(1)
    }
  }
}
