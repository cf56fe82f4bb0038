package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — the manual fallback when AQE's runtime
  * skew-join split doesn't apply (e.g. aggregation skew, or a skewed
  * shuffle-hash build side that can't be broadcast).
  *
  * The reference never faces this (each HTTP request touches one key), but
  * a triple store at 100 TB does: predicates are a tiny hot-key domain
  * (6 values here; a handful of `rdf:type`-like predicates dominate real
  * RDF corpora), so any shuffle keyed by predicate sends almost all rows to
  * a few reducers.
  *
  * Measured on a 90 %-hot corpus (`graft.tools.SkewJoinBench`, BENCH_NOTES
  * r12): plain join 2.18 s, [[saltedJoin]] 1.48 s, AQE skew split 0.65 s —
  * so for JOINs prefer AQE where it applies and keep the salt as the
  * fallback; [[saltedAgg]] covers the aggregation-skew shape AQE's
  * skew-join rule cannot touch.
  */
object Skew {

  /** Salt in `[0, saltFactor)`: seeded `rand` — uniform even when a hot
    * key's rows are byte-identical (a row-hash salt would collapse those
    * onto one reducer), and reproducible under task retry because Spark
    * seeds the generator per partition from the given seed. */
  def saltColumn(saltFactor: Int): Column =
    floor(rand(42) * saltFactor).cast("int")

  /** Equi-join `skewed ⋈ dim` on `key` where a few `key` values dominate
    * the left side: each left row gets a salt from [[saltColumn]], the dim
    * side is replicated `saltFactor` times, and the join runs on
    * `(key, salt)` — hot keys spread over `saltFactor` reducers instead of
    * one. */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val salted = skewed.withColumn("_salt", saltColumn(saltFactor))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase salted aggregation for skewed group keys: partial aggregate
    * on `(key, salt)`, then final combine on `key`. `partial` must be an
    * algebraic partial aggregate and `finalAgg` its combiner (e.g.
    * count → sum, sum → sum, max → max). */
  def saltedAgg(skewed: DataFrame, key: String, saltFactor: Int,
      partial: Column => Column, partialIn: Column,
      finalAgg: Column => Column): DataFrame =
    skewed
      .withColumn("_salt", saltColumn(saltFactor))
      .groupBy(col(key), col("_salt"))
      .agg(partial(partialIn).as("_partial"))
      .groupBy(col(key))
      .agg(finalAgg(col("_partial")).as("agg"))

  /** Q72 gate entry: [[saltedJoin]] over the store's hot-key JOIN shape —
    * `triples ⋈ dim` on `predicate`, the skew twin of q35's salted
    * aggregation. The predicate domain is 6 values, so a plain shuffle join
    * keys ~1/6 of the corpus to each of six reducers — the 100× shape the
    * reference's O3 probe loop (`MongoDBConnector.py:131-157`) becomes when
    * one key dominates a changelog. Salting is semantics-preserving, so the
    * PLAIN join is the exact oracle ([[q72Sql]]); SkewSpec pins the
    * physical shape (join keys `(predicate, _salt)`, hot key fanned over
    * `saltFactor` reducers with broadcast disabled).
    *
    * The dim side is derived from the corpus itself (distinct predicates +
    * their char length) so both engines rebuild it deterministically; at
    * gate scale Spark broadcasts it — replication cost `saltFactor × 6`
    * rows — and at 100 TB, where the dim outgrows the broadcast threshold,
    * the same plan degrades to the sort-merge join the spec pins. */
  def q72SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val triples = graft.TripleStore.triples(spark, dir)
    val dim = triples.select(col("predicate")).distinct()
      .withColumn("pred_len", length(col("predicate")).cast("long"))
    saltedJoin(triples, dim, "predicate", saltFactor = 8)
      .select(col("subject"), col("predicate"), col("object"),
        col("ts_ms"), col("pred_len"))
      .orderBy("subject", "predicate", "object")
  }

  val q72Sql: String =
    s"""WITH ${graft.TripleStore.TriplesCte},
       |dim AS (SELECT DISTINCT predicate,
       |               CAST(length(predicate) AS BIGINT) AS pred_len
       |        FROM triples)
       |SELECT t.subject, t.predicate, t.object, t.ts_ms, d.pred_len
       |FROM triples t JOIN dim d USING (predicate)
       |ORDER BY subject, predicate, object""".stripMargin
}
