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

  test("the production salt spreads a hot key over saltFactor buckets, " +
    "even for byte-identical rows") {
    val triples = TripleStore.triples(spark, sf)
    val spread = triples.filter(col("predicate") === "<hasStatus>")
      .withColumn("_salt", Skew.saltColumn(8))
      .select("_salt").distinct().count()
    assert(spread == 8, s"hot key only reached $spread salt buckets")
    // identical rows must also spread (a row-hash salt would collapse them)
    val dupes = Seq.fill(200)(("k", "v")).toDF("k", "v")
      .withColumn("_salt", Skew.saltColumn(8))
      .select("_salt").distinct().count()
    assert(dupes == 8, s"identical rows reached only $dupes buckets")
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
