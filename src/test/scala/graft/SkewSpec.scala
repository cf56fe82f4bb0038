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

  test("model check: saltedJoin == plain inner join as a MULTISET on " +
    "random data (dup rows both sides, null keys, unmatched keys)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // tiny key domain with nulls and keys present on only one side: the
    // salt must neither drop nor duplicate any matched pair, row
    // multiplicity included (hence sorted-seq, not set, comparison)
    val genLeft = Gen.listOfN(10, for {
      k <- Gen.oneOf(Some("a"), Some("a"), Some("b"), Some("l"), None)
      v <- Gen.choose(0, 3)
    } yield (k, v))
    val genDim = Gen.listOfN(5, for {
      k <- Gen.oneOf(Some("a"), Some("b"), Some("d"), None)
      p <- Gen.choose(10, 12)
    } yield (k, p))
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12),
      Prop.forAll(genLeft, genDim) { (ls, ds) =>
        val l = ls.toDF("k", "v")
        val d = ds.toDF("k", "p")
        val plain = l.join(d, Seq("k"))
          .as[(String, Int, Int)].collect().toSeq.sorted
        val salted = Skew.saltedJoin(l, d, "k", saltFactor = 4)
          .select("k", "v", "p")
          .as[(String, Int, Int)].collect().toSeq.sorted
        salted == plain
      })
    assert(res.passed, res.status.toString)
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

  test("q72 gate: the salted-join plan keys the shuffle on (key, salt) — " +
    "hot keys fan out — and still matches the plain join") {
    // broadcast disabled: force the shuffle-join shape the salt exists for
    // (at gate scale the tiny dim side would otherwise broadcast, where
    // skew is moot and the plan assertion would be vacuous)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Skew.q72SaltedJoin(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      // the salt IS the fan-out: with it in the join key, one hot
      // predicate hashes to saltFactor distinct reducers instead of one
      val joinLine = plan.linesIterator.find(l =>
        l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
        .getOrElse(fail(s"no shuffle join in plan:\n$plan"))
      assert(joinLine.contains("predicate") && joinLine.contains("_salt"),
        s"join does not key on (predicate, _salt): $joinLine")
      val exchangeLine = plan.linesIterator.find(l =>
        l.contains("hashpartitioning") && l.contains("_salt"))
      assert(exchangeLine.isDefined,
        s"no hashpartitioning exchange carries the salt:\n$plan")
      // semantics preserved under the forced shuffle shape
      val salted = df.as[(String, String, String, Long, Long)]
        .collect().toSeq.sorted
      val dim = TripleStore.triples(spark, sf)
        .select(col("predicate")).distinct()
        .withColumn("pred_len", length(col("predicate")).cast("long"))
      val plain = TripleStore.triples(spark, sf)
        .join(dim, Seq("predicate"))
        .select(col("subject"), col("predicate"), col("object"),
          col("ts_ms"), col("pred_len"))
        .as[(String, String, String, Long, Long)].collect().toSeq.sorted
      assert(salted == plain)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("saltedJoin keeps inner-join NULL-key semantics: null keys drop " +
    "on both paths") {
    // a null key never equi-joins; salting must not resurrect it (the
    // salt column is non-null, so a (null, salt) pair could otherwise
    // look joinable if the key ever fell out of the join condition)
    val left = Seq(("a", "k1"), ("b", null), ("c", "k2"), ("d", null))
      .toDF("id", "key")
    val dim = Seq(("k1", 1L), ("k2", 2L), (null, 99L)).toDF("key", "v")
    val plain = left.join(dim, Seq("key"))
      .select("id", "v").as[(String, Long)].collect().toSet
    val salted = Skew.saltedJoin(left, dim, "key", saltFactor = 4)
      .select("id", "v").as[(String, Long)].collect().toSet
    assert(salted == plain && plain == Set(("a", 1L), ("c", 2L)))
  }
}
