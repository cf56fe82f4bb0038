package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions surface: the native hamming_distance
  * expression and the lww_object → max_by optimizer rewrite. */
class PlansSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("hamming_distance is registered and codegen-correct") {
    import spark.implicits._
    val r = spark.sql(
      """SELECT hamming_distance('01010101', '01110101') AS a,
        |       hamming_distance('0000', '0000') AS b,
        |       hamming_distance('111', '1') AS c,
        |       hamming_distance(CAST(NULL AS STRING), '1') AS d""".stripMargin)
      .as[(Long, Long, Long, Option[Long])].head()
    assert(r == ((1L, 0L, 2L, None)))
  }

  test("hamming_distance matches a column-composed equivalent on real data") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sim = graft.operators.Docs.q20Simhash(spark, sf).limit(50)
    val pairs = sim.as("a").crossJoin(sim.as("b"))
      .select(col("a.simhash").as("x"), col("b.simhash").as("y"))
    val diff = pairs.select(
      (expr("hamming_distance(x, y)") -
        expr("size(filter(sequence(0, 31), i -> substring(x, i+1, 1) <> substring(y, i+1, 1)))")
          .cast("long")).as("delta"))
      .agg(sum(abs(col("delta")))).as[Long].head()
    assert(diff == 0L)
  }

  test("optimizer rewrites the lww_object UDAF to native max_by (Q12 plan)") {
    val df = SparkEntry.queries("q12_lww_udaf")(spark, sf)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("max_by"), s"no max_by in:\n$optimized")
    assert(!optimized.contains("ScalaAggregator"),
      s"UDAF not rewritten:\n$optimized")
  }

  test("rewritten Q12 still equals the pure-LWW window semantics") {
    import spark.implicits._
    val got = SparkEntry.queries("q12_lww_udaf")(spark, sf)
      .as[(String, String, String)].collect().toSet
    // independent twin: merge-comparator winners via the batch kernel
    val want = operators.Lww.merge(
        TripleStore.triples(spark, sf), TripleStore.remoteChangelog(spark, sf))
      .selectExpr("subject", "predicate", "object")
      .as[(String, String, String)].collect().toSet
    // q12 is PURE (ts, object) LWW while merge() adds the local-wins prio
    // bit, so equal-ts winners can differ by design; the value-level oracle
    // for q12 is the DuckDB gate. Here we assert the rewrite preserves the
    // key space (one winner per logical key, no keys lost or invented).
    assert(got.map(t => (t._1, t._2)) == want.map(t => (t._1, t._2)))
  }
}
