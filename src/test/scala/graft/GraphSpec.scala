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

  test("pageRank: ranks form a distribution, the hub dominates, dangling " +
    "mass is redistributed") {
    // star into <h> plus a back-edge; <d> receives from <h>... no: <h> -> <a>
    // only, and <d> is dangling (no out-edges) via <c> -> <d>
    val edges = Seq(
      ("<a>", "<h>"), ("<b>", "<h>"), ("<c>", "<h>"),
      ("<h>", "<a>"), ("<c>", "<d>")).toDF("src", "dst")
    val ranks = Graph.pageRank(edges, iters = 20)
      .as[(String, Double)].collect().toMap
    assert(math.abs(ranks.values.sum - 1.0) < 1e-6,
      s"ranks not a distribution: ${ranks.values.sum}")
    assert(ranks("<h>") > ranks("<a>"), s"$ranks")
    assert(ranks("<a>") > ranks("<b>"), s"$ranks")
    assert(ranks("<b>") == ranks("<c>"), s"$ranks")
    assert(ranks.values.forall(_ > 0))
  }

  test("pageRank on the store: region hubs outrank every order node") {
    val e = Graph.edges(spark, "/root/testdata/sf0.001")
    val ranks = Graph.pageRank(e, iters = 5)
    assert(math.abs(ranks.agg(sum("rank")).head().getDouble(0) - 1.0) < 1e-6)
    val minRegion = ranks.filter(col("node").startsWith("<region_"))
      .agg(min("rank")).head().getDouble(0)
    val maxOrder = ranks.filter(col("node").startsWith("<order_"))
      .agg(max("rank")).head().getDouble(0)
    assert(minRegion > maxOrder,
      s"region floor $minRegion vs order ceiling $maxOrder")
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
