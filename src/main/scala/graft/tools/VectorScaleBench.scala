package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.LocalSession
import graft.operators.Vectors

/** ANN at 10M-vector cardinality (r16; the r13 run was 1M — the one
  * pillar still an order of magnitude behind the others' rehearsal
  * scale). Runs the PRODUCTION kernels, not copies:
  *
  *   - index build: `ivfAssignVectors` with the r16 TRAINING SAMPLE
  *     (k-means iterates on `xxhash64(vec_id) % trainMod == 0`; only the
  *     final assignment touches the full corpus) — the 100 TB build
  *     shape, where the quantizer needs a representative sample, not
  *     every row;
  *   - exact brute-force top-k (the float baseline recall is scored
  *     against);
  *   - IVF probe (`ivfProbe`, median of 3);
  *   - int8 serving scan (`quantizedServingTopk` — q85's query body on
  *     the 4×-smaller representation), with its own recall vs the float
  *     baseline;
  *   - incremental ingest: `ivfAppendBatch` of a crawl-sized batch into
  *     the on-disk layout, with the grown-layout row-count identity and
  *     the batchId replay suppression both ASSERTED, then a probe over
  *     the grown layout.
  *
  * Corpus: `nClusters` well-separated hash-derived centers + bounded
  * noise (deterministic, cluster-structured — recall is a meaningful
  * number, not a uniform-cloud coin flip), written to parquet first so
  * every leg reads disk like production (and the 10M frame never pins
  * the heap; the r15 PageRank rehearsal's lesson).
  *
  * Exits non-zero on: IVF recall < 0.6, int8 recall < 0.6, or an
  * append row-count identity violation.
  *
  * Usage: SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.tools.VectorScaleBench [rows] [k] [nprobe]
  *        [trainMod] [batchRows]"
  */
object VectorScaleBench {

  private val Dim = 64
  private val TopK = 10
  private val NumQueries = 5 // mirrors Vectors.NumQueries: vec_id < 5 probe

  /** center(id % nClusters) + noise, all hash-derived: deterministic,
    * cluster-structured, buildable without a data file. */
  private def synthVectors(spark: SparkSession, rows: Long,
      nClusters: Int, idOffset: Long = 0L): DataFrame =
    spark.range(rows)
      .select((col("id") + idOffset).as("vec_id"), expr(
        s"""transform(sequence(0, ${Dim - 1}), j ->
           |  CAST((hash((id + $idOffset) % $nClusters, j) % 1000) / 500.0
           |       + (hash(id + $idOffset, j) % 100) / 500.0 AS FLOAT))"""
          .stripMargin)
        .as("embedding"))

  private def recallOf(exact: Map[Long, Set[Long]],
      approx: Map[Long, Set[Long]]): Double = {
    val rs = exact.map { case (q, ex) =>
      approx.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    rs.sum / math.max(1, rs.size)
  }

  private def sets(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
    rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 10000000L
    val k = if (args.length > 1) args(1).toInt else 64
    val nprobe = if (args.length > 2) args(2).toInt else 4
    val trainMod = if (args.length > 3) args(3).toLong else 10L
    val batchRows = if (args.length > 4) args(4).toLong else 100000L
    val spark = LocalSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def f(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    val tmp = sys.props("java.io.tmpdir")
    val corpusPath = s"$tmp/graft_vecscale_corpus"
    val layout = s"$tmp/graft_vecscale_index"
    synthVectors(spark, rows, k)
      .write.mode("overwrite").parquet(corpusPath)
    val vecs = spark.read.parquet(corpusPath)
    val nVecs = vecs.count()

    // index build: spherical k-means (3 iterations, gate convention) on
    // the 1/trainMod sample, full-corpus final assignment, written as the
    // ivfIndexPath layout (cluster-clustered lists + centroid table) so
    // the append leg exercises the REAL on-disk maintenance path
    val (nAssigned, tBuild) = timed {
      val (assigned, centroids) =
        Vectors.ivfAssignVectors(vecs, k, iters = 3, trainSampleMod = trainMod)
      assigned.repartitionByRange(col("cluster"))
        .sortWithinPartitions("cluster", "vec_id")
        .write.mode("overwrite").parquet(s"$layout/lists")
      centroids.write.mode("overwrite").parquet(s"$layout/centroids")
      spark.read.parquet(s"$layout/lists").count()
    }
    val lists = spark.read.parquet(s"$layout/lists")
    val centroids = spark.read.parquet(s"$layout/centroids")

    // exact float baseline: brute-force cosine top-k for the 5 queries
    val norm = lists.select(col("vec_id"), col("v"))
    val queries = norm.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .localCheckpoint(true)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    // stableRound, NOT the builtin: the kernels this baseline scores
    // (ivfProbe, quantizedServingTopk) rank on the stable form, and a
    // .xxxx5-boundary tie rounding differently here would perturb the
    // measured recall with a rounding artifact, not index behavior
    def exactTopk() = queries.crossJoin(norm)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        graft.functions.StableRound.stableRound(
          expr("aggregate(zip_with(qv, v, (a, b) -> a * b), " +
            "CAST(0 AS DOUBLE), (acc, p) -> acc + p)"), 4).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
    val (exact, tExact) = timed(exactTopk().collect())
    val exactSets = sets(exact)

    // IVF probe over the on-disk layout, median of 3
    def ivf() = Vectors.ivfProbe(lists, centroids, nprobe, TopK)
    val (approx, tIvf0) = timed(ivf().collect())
    val (_, tIvf1) = timed(ivf().collect())
    val (_, tIvf2) = timed(ivf().collect())
    val tIvf = Seq(tIvf0, tIvf1, tIvf2).sorted.apply(1)
    val ivfRecall = recallOf(exactSets, sets(approx))

    // int8 serving scan: q85's production kernel on the quantized corpus
    def int8() = Vectors.quantizedServingTopk(vecs, TopK)
    val (int8Rows, tInt80) = timed(int8().collect())
    val (_, tInt81) = timed(int8().collect())
    val (_, tInt82) = timed(int8().collect())
    val tInt8 = Seq(tInt80, tInt81, tInt82).sorted.apply(1)
    val int8Recall = recallOf(exactSets, sets(int8Rows))

    // incremental ingest: one crawl batch through ivfAppendBatch (frozen
    // centroids, file-level append), identity + replay both asserted
    val batch = synthVectors(spark, batchRows, k, idOffset = rows)
    val (_, tAppend) = timed {
      Vectors.ivfAppendBatch(spark, layout, batch,
        batchId = Some(0L), streamId = "vecscale")
    }
    val grown = spark.read.parquet(s"$layout/lists").count()
    val appendOk = grown == nAssigned + batchRows
    // replay suppression: the same batchId must be a no-op
    Vectors.ivfAppendBatch(spark, layout, batch,
      batchId = Some(0L), streamId = "vecscale")
    val replayOk = spark.read.parquet(s"$layout/lists").count() == grown
    // the grown layout still probes (cold, informational)
    val (_, tIvfGrown) = timed(
      Vectors.ivfProbe(spark.read.parquet(s"$layout/lists"),
        centroids, nprobe, TopK).collect())

    println(s"""{"metric":"vector_scale","vectors":$nVecs,"dim":$Dim,""" +
      s""""k":$k,"nprobe":$nprobe,"train_mod":$trainMod,""" +
      s""""indexed":$nAssigned,"build_sec":${f(tBuild)},""" +
      s""""exact_topk_sec":${f(tExact)},"ivf_topk_sec":${f(tIvf)},""" +
      s""""ivf_topk_cold_sec":${f(tIvf0)},"recall_at_10":${f(ivfRecall)},""" +
      s""""int8_topk_sec":${f(tInt8)},"int8_topk_cold_sec":${f(tInt80)},""" +
      s""""int8_recall_at_10":${f(int8Recall)},""" +
      s""""append_rows":$batchRows,"append_sec":${f(tAppend)},""" +
      s""""append_identity_ok":$appendOk,"replay_suppressed_ok":$replayOk,""" +
      s""""ivf_grown_cold_sec":${f(tIvfGrown)},"queries":${exactSets.size}}""")
    spark.stop()
    val bad =
      (if (ivfRecall < 0.6) Seq(s"ivf recall $ivfRecall") else Nil) ++
      (if (int8Recall < 0.6) Seq(s"int8 recall $int8Recall") else Nil) ++
      (if (!appendOk) Seq(s"append identity: $grown != $nAssigned+$batchRows")
       else Nil) ++
      (if (!replayOk) Seq("replayed batch not suppressed") else Nil)
    if (bad.nonEmpty) {
      System.err.println(s"[vector_scale] FAILED: ${bad.mkString("; ")}")
      sys.exit(1)
    }
  }
}
