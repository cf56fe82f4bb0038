package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational, Temporal}

/** The temporal join operators: binned range join + union-window as-of join.
  * Semantics on hand-built frames, plan shape on the gate queries (the scale
  * claim is "no nested-loop join node, bounded shuffles" — assert it). */
class TemporalSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  test("eventTsMs dispatches on the physical ts type: ns longs and " +
    "(ntz) timestamps floor to the same epoch millis") {
    // the driver's testdata generation has shipped BOTH encodings of
    // events.ts across rounds (timestamp[ns] → raw longs under
    // nanosAsLong; timestamp[us] → a timestamp); every consumer must get
    // identical millis either way — three specs hard-coding the ns form
    // broke the day the generation flipped
    val instantMs = 1700000000123L // arbitrary epoch ms with a sub-second
    val asNs = Seq(instantMs * 1000000L + 999999L).toDF("ts") // ns long
    val asTs = Seq(new java.sql.Timestamp(instantMs)).toDF("ts")
    val fromNs = asNs.select(Relational.eventTsMs(asNs).as("ms"))
      .as[Long].head()
    val fromTs = asTs.select(Relational.eventTsMs(asTs).as("ms"))
      .as[Long].head()
    assert(fromNs == instantMs, s"ns branch: $fromNs")
    assert(fromTs == instantMs, s"timestamp branch: $fromTs")
  }

  // --- rangeJoin semantics ---------------------------------------------------

  private def probeDf = Seq(
    // (key, time, id)
    ("u1", 100L, "e1"), // inside [50, 150)
    ("u1", 150L, "e2"), // AT end -> excluded (half-open)
    ("u1", 50L, "e3"),  // AT start -> included
    ("u1", 49L, "e4"),  // before start -> excluded
    ("u2", 100L, "e5"), // other key: no interval -> excluded
    ("u1", 910L, "e6"), // inside the bucket-spanning interval [870, 970)
    ("u1", 969L, "e7"), // last admissible ms of it
    ("u1", 970L, "e8")  // its end -> excluded
  ).toDF("k", "t", "id")

  private def intervalsDf = Seq(
    ("u1", 50L, 150L, "w1"),
    ("u1", 870L, 970L, "w2"), // spans the 100-wide bucket boundary at 900
    ("u1", 60L, 140L, "w3"),  // overlaps w1: e1 must match BOTH
    ("u1", 300L, 300L, "w4"), // empty -> matches nothing
    ("u1", 400L, 350L, "w5")  // inverted -> dropped, matches nothing
  ).toDF("k", "s", "e", "w")

  test("rangeJoin: half-open containment, bucket spanning, overlap, empty/inverted") {
    val got = Temporal.rangeJoin(probeDf, intervalsDf, Seq("k"), "t", "s", "e", 100L)
      .select("id", "w").as[(String, String)].collect().toSet
    assert(got == Set(
      ("e1", "w1"), ("e1", "w3"), ("e3", "w1"),
      ("e6", "w2"), ("e7", "w2")))
  }

  test("rangeJoin: pairs are unique even when interval and probe share a bucket twice") {
    // interval exactly one bucket wide starting mid-bucket -> replicated to
    // 2 buckets; each probe row lives in ONE bucket, so no pair dup
    val n = Temporal.rangeJoin(probeDf, intervalsDf, Seq("k"), "t", "s", "e", 100L)
      .groupBy("id", "w").count().filter(col("count") > 1).count()
    assert(n == 0L)
  }

  test("model check: rangeJoin == naive inequality filter on random data " +
    "(intervals straddling/equal to bucket edges, empty/inverted included)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // bucket width 4 with times 0..15: intervals start/end mid-bucket, on
    // edges, inverted, and empty; every (probe, interval) pair must appear
    // exactly once or not at all
    val genProbe = Gen.listOfN(8, for {
      k <- Gen.oneOf("a", "b"); t <- Gen.choose(0L, 15L)
    } yield (k, t)).map(_.zipWithIndex.map { case ((k, t), i) =>
      (k, t, s"e$i") })
    val genIv = Gen.listOfN(5, for {
      k <- Gen.oneOf("a", "b"); s <- Gen.choose(0L, 15L)
      e <- Gen.choose(0L, 16L)
    } yield (k, s, e)).map(_.zipWithIndex.map { case ((k, s, e), i) =>
      (k, s, e, s"w$i") })
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12),
      Prop.forAll(genProbe, genIv) { (ps, ivs) =>
        val got = Temporal.rangeJoin(ps.toDF("k", "t", "id"),
            ivs.toDF("k", "s", "e", "w"), Seq("k"), "t", "s", "e", 4L)
          .select("id", "w").as[(String, String)].collect()
        val want = for {
          (pk, t, id) <- ps; (ik, s, e, w) <- ivs
          if pk == ik && t >= s && t < e
        } yield (id, w)
        // exact multiset equality: a replicated interval meeting a probe in
        // two buckets would show up here as a duplicated pair
        got.sorted.toSeq == want.sorted
      })
    assert(res.passed, res.status.toString)
  }

  test("q45 plan: equi-join on (key, bucket), no nested-loop or cartesian node") {
    val plan = SparkEntry.queries("q45_range_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("_gbucket"), s"bucket key missing from join:\n$plan")
  }

  test("q45 matches a direct (unscalable) inequality-join evaluation") {
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val ev = raw
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        Relational.eventTsMs(raw).as("ts_ms"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("win_id"),
        col("ts_ms").as("ws"))
    val naive = ev.join(p, col("user_id") === col("pu") &&
        col("ts_ms") >= col("ws") &&
        col("ts_ms") < col("ws") + Temporal.AttributionWindowMs)
      .groupBy(col("user_id"), col("win_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
    val fast = SparkEntry.queries("q45_range_join")(spark, sf)
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  // --- asofJoin semantics ----------------------------------------------------

  private def leftDf = Seq(
    ("u1", 100L, 1L), // after r at 90 -> matches it
    ("u1", 90L, 2L),  // EXACTLY at r's time -> exact match allowed
    ("u1", 89L, 3L),  // before any r -> null
    ("u1", 501L, 4L), // latest r at 200 is 301 old: outside tolerance 300 -> null
    ("u1", 250L, 5L), // two r at 200: larger tie wins
    ("u2", 100L, 6L)  // key with no r rows at all -> null
  ).toDF("k", "t", "lid")

  private def rightDf = Seq(
    ("u1", 90L, 10L, "a"),
    ("u1", 200L, 11L, "b1"), // same time as the next: tie 12 > 11
    ("u1", 200L, 12L, "b2")
  ).toDF("k", "t", "rid", "pay")

  test("asofJoin: exact match, tie-break, tolerance, no-match nulls, key isolation") {
    val got = Temporal.asofJoin(leftDf, rightDf, Seq("k"), "t", "t",
        "lid", "rid", Seq("pay"), Some(300L))
      .select("lid", "pay").as[(Long, Option[String])].collect().toMap
    assert(got == Map(
      1L -> Some("a"), 2L -> Some("a"), 3L -> None,
      4L -> None, 5L -> Some("b2"), 6L -> None))
  }

  test("asofJoin: unbounded lookback when tolerance is None") {
    val got = Temporal.asofJoin(leftDf, rightDf, Seq("k"), "t", "t",
        "lid", "rid", Seq("pay"), None)
      .filter(col("lid") === 4L).select("pay").as[String].head()
    assert(got == "b2")
  }

  test("asofJoin plan: one hash exchange, no join node") {
    val plan = Temporal.asofJoin(leftDf, rightDf, Seq("k"), "t", "t",
        "lid", "rid", Seq("pay"), Some(300L))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"join node in as-of plan:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
  }

  test("model check: asofJoin == naive per-row backward scan on random " +
    "data (dense time domain forces exact-match, tie, and tolerance hits)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val tol = 3L
    // times 0..7 on two keys: collisions everywhere, so exact matches,
    // right-right ties, and out-of-tolerance gaps all occur routinely
    val genLeft = Gen.listOfN(8, for {
      k <- Gen.oneOf("u1", "u2"); t <- Gen.choose(0L, 7L)
    } yield (k, t)).map(_.zipWithIndex.map { case ((k, t), i) =>
      (k, t, i.toLong) })
    val genRight = Gen.listOfN(6, for {
      k <- Gen.oneOf("u1", "u2"); t <- Gen.choose(0L, 7L)
    } yield (k, t)).map(_.zipWithIndex.map { case ((k, t), i) =>
      (k, t, 100L + i, s"p$i") })
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12),
      Prop.forAll(genLeft, genRight) { (ls, rs) =>
        val got = Temporal.asofJoin(ls.toDF("k", "t", "lid"),
            rs.toDF("k", "t", "rid", "pay"),
            Seq("k"), "t", "t", "lid", "rid", Seq("pay"), Some(tol))
          .select("lid", "pay").as[(Long, Option[String])].collect().toMap
        val want = ls.map { case (k, t, lid) =>
          val cands = rs.filter(r => r._1 == k && r._2 <= t && t - r._2 <= tol)
          lid -> (if (cands.isEmpty) None
                  else Some(cands.maxBy(r => (r._2, r._3))._4))
        }.toMap
        got == want
      })
    assert(res.passed, res.status.toString)
  }

  test("q46 matches a direct (unscalable) inequality-join evaluation") {
    // the view pre-normalizes ts to epoch ms so the SQL twin is agnostic to
    // the parquet timestamp generation (ns longs vs us timestamps)
    val rawAsof = spark.read.parquet(s"$sf/events.parquet")
    rawAsof.withColumn("ts_ms", Relational.eventTsMs(rawAsof))
      .createOrReplaceTempView("ev_asof")
    val naive = spark.sql(
      s"""WITH e AS (SELECT user_id, event_id, event_type, round(value, 2) AS value,
         |                  ts_ms FROM ev_asof),
         |l AS (SELECT * FROM e WHERE event_type <> 'purchase'),
         |r AS (SELECT user_id AS ru, ts_ms AS rt, event_id AS rid, value AS rv
         |      FROM e WHERE event_type = 'purchase')
         |SELECT l.user_id, l.event_id, l.ts_ms, l.event_type,
         |       max_by(rid, struct(rt, rid)) AS purchase_id,
         |       max_by(rv, struct(rt, rid)) AS purchase_value
         |FROM l LEFT JOIN r ON l.user_id = ru
         |  AND rt <= l.ts_ms AND rt >= l.ts_ms - ${Temporal.AsofToleranceMs}
         |GROUP BY l.user_id, l.event_id, l.ts_ms, l.event_type""".stripMargin)
    val fast = SparkEntry.queries("q46_asof_join")(spark, sf)
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }
}
