package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class GraphSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("connectedComponents: two known components converge to min labels") {
    // component 1: a-b-c (chain); component 2: x-y; isolated edge z->z
    val edges = Seq(
      ("<a>", "<b>"), ("<b>", "<c>"),
      ("<x>", "<y>"),
      ("<z>", "<z>")).toDF("src", "dst")
    val got = Graph.connectedComponents(edges)
      .as[(String, String)].collect().toMap
    assert(got == Map(
      "<a>" -> "<a>", "<b>" -> "<a>", "<c>" -> "<a>",
      "<x>" -> "<x>", "<y>" -> "<x>",
      "<z>" -> "<z>"))
  }

  test("connectedComponents on the store: every order reaches its region's " +
    "component") {
    val e = Graph.edges(spark, "/root/testdata/sf0.001")
    val cc = Graph.connectedComponents(e)
    // order -> cust -> nation -> region chains: component count equals the
    // number of distinct regions (every region label is a component root),
    // and every label is a region-or-smaller minimum, i.e. starts with '<'.
    val nComponents = cc.select("label").distinct().count()
    val nRegions = spark.read
      .parquet("/root/testdata/sf0.001/region.parquet").count()
    assert(nComponents == nRegions)
    // all orders got a label strictly smaller than their own id
    val orders = cc.filter(col("node").startsWith("<order_"))
    assert(orders.filter(col("label") >= col("node")).count() == 0)
  }
}
