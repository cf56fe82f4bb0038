package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Lww

/** The pure-SQL surface: temp views + injected functions, so a client that
  * only speaks query text (the reference's entire access model,
  * `MasterServer.py:292-330`) can run the store's core operations without
  * touching the Scala API. */
class SqlSurfaceSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  TripleStore.registerViews(spark, sf)

  test("O1 point scan as SQL text over the registered views") {
    import spark.implicits._
    val got = spark.sql(
        "SELECT * FROM triples WHERE subject = '<order_1>' ORDER BY predicate")
      .as[(String, String, String, Long)].collect().toSeq
    val want = TripleStore.search(spark, sf, "<order_1>")
      .orderBy("predicate")
      .as[(String, String, String, Long)].collect().toSeq
    assert(got == want && got.nonEmpty)
    // and the same rows come back from the sharded layout's view
    val sharded = spark.sql(
        "SELECT * FROM store_sharded WHERE subject = '<order_1>' ORDER BY predicate")
      .as[(String, String, String, Long)].collect().toSeq
    assert(sharded == want)
  }

  test("O3 anti-entropy merge as pure SQL == Lww.merge") {
    import spark.implicits._
    val got = spark.sql(Lww.mergeSql("triples", "remote_changelog"))
      .as[(String, String, String, Long)].collect().toSet
    val want = Lww.merge(
        TripleStore.triples(spark, sf), TripleStore.remoteChangelog(spark, sf))
      .as[(String, String, String, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("lww_object is callable from SQL text and plans as native max_by") {
    import spark.implicits._
    val df = spark.sql(
      """SELECT subject, predicate, lww_object(object, ts_ms) AS object
        |FROM (SELECT * FROM triples UNION ALL SELECT * FROM remote_changelog)
        |GROUP BY subject, predicate""".stripMargin)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("max_by"), s"no max_by in:\n$optimized")
    assert(!optimized.contains("ScalaAggregator"),
      s"SQL lww_object should not round-trip a UDAF:\n$optimized")
    // same winners as the typed Column-API UDAF (q12's path)
    val got = df.as[(String, String, String)].collect().toSet
    val want = TripleStore.triples(spark, sf)
      .unionByName(TripleStore.remoteChangelog(spark, sf))
      .groupBy("subject", "predicate")
      .agg(graft.functions.LwwObject.column(
        org.apache.spark.sql.functions.col("object"),
        org.apache.spark.sql.functions.col("ts_ms")).as("object"))
      .as[(String, String, String)].collect().toSet
    assert(got == want && got.nonEmpty)
  }
}
