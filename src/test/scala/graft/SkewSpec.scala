package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("saltedJoin == plain join on a skewed predicate key") {
    val triples = TripleStore.triples(spark, sf) // predicate: 6 hot values
    val dim = Seq(
      ("<hasStatus>", "status"), ("<orderedBy>", "edge"),
      ("<inNation>", "edge"), ("<inRegion>", "edge"),
      ("<hasPriority>", "attr"), ("<hasSegment>", "attr"))
      .toDF("predicate", "kind")
    val plain = triples.join(dim, Seq("predicate"))
      .groupBy("kind").count().as[(String, Long)].collect().toSet
    val salted = Skew.saltedJoin(triples, dim, "predicate", saltFactor = 8)
      .groupBy("kind").count().as[(String, Long)].collect().toSet
    assert(salted == plain)
  }

  test("saltedJoin spreads a hot key over saltFactor partitions") {
    val triples = TripleStore.triples(spark, sf)
    val salted = triples.withColumn("_salt",
      pmod(hash(triples.columns.map(col).toIndexedSeq: _*), lit(8)))
    val spread = salted.filter(col("predicate") === "<hasStatus>")
      .select("_salt").distinct().count()
    assert(spread == 8, s"hot key only reached $spread salt buckets")
  }

  test("saltedAgg == direct aggregation (count and max)") {
    val triples = TripleStore.triples(spark, sf)
    val direct = triples.groupBy("predicate").count()
      .as[(String, Long)].collect().toSet
    val salted = Skew.saltedAgg(triples, "predicate", 8,
        partial = count, partialIn = lit(1), finalAgg = sum)
      .select(col("predicate"), col("agg").cast("long"))
      .as[(String, Long)].collect().toSet
    assert(salted == direct)

    val directMax = triples.groupBy("predicate").agg(max("object"))
      .as[(String, String)].collect().toSet
    val saltedMax = Skew.saltedAgg(triples, "predicate", 8,
        partial = max, partialIn = col("object"), finalAgg = max)
      .as[(String, String)].collect().toSet
    assert(saltedMax == directMax)
  }
}
