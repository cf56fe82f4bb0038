package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Lww

class TripleStoreSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("search: O1 point scan returns the subject's triples (flagship)") {
    val rows = TripleStore.search(spark, sf, "<order_42>")
      .as[Triple].collect()
    assert(rows.length == 3)
    assert(rows.map(_.predicate).sorted.toSeq ==
      Seq("<hasPriority>", "<hasStatus>", "<orderedBy>"))
  }

  test("searchSharded == search, and the filter is pushed to the scan") {
    val direct  = TripleStore.search(spark, sf, "<order_42>")
      .as[Triple].collect().toSet
    val sharded = TripleStore.searchSharded(spark, sf, "<order_42>")
    assert(sharded.as[Triple].collect().toSet == direct)
    // Over the materialized layout the predicate reaches the parquet reader
    // (row-group min/max skipping); over the derived view it cannot.
    val plan = sharded.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(subject), EqualTo(subject,<order_42>)]"),
      s"subject filter not pushed:\n$plan")
  }

  test("sharded layout: range partitions cover disjoint subject ranges") {
    val path = TripleStore.shardedPath(spark, sf)
    val files = spark.read.parquet(path).inputFiles
    assert(files.length >= 2)   // numShards=3, small data may coalesce ranges
    // Each file's [min, max] subject range must not overlap any other's —
    // that disjointness is what makes shard pruning possible (the analog of
    // the reference's non-overlapping SHARDING boxes, MasterServer.py:59-63).
    val ranges = files.toSeq.map { f =>
      val r = spark.read.parquet(f)
        .agg(org.apache.spark.sql.functions.min("subject"),
          org.apache.spark.sql.functions.max("subject"))
        .as[(String, String)].head()
      r
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"overlap: $ranges")
      case _ =>
    }
  }

  test("shardPredicate filters a changelog to a shard's range box (O5/O11)") {
    val upd = TripleStore.updates(spark, sf)
    val inShard = upd.filter(Lww.shardPredicate("<order_1", "<a", "<order_5", "<z"))
      .as[Triple].collect()
    assert(inShard.nonEmpty)
    assert(inShard.forall(t =>
      t.subject >= "<order_1" && t.subject <= "<order_5"))
    // complement check: nothing outside the box was kept
    val all = upd.as[Triple].collect()
    val expected = all.filter(t =>
      t.subject >= "<order_1" && t.subject <= "<order_5" &&
        t.predicate >= "<a" && t.predicate <= "<z")
    assert(inShard.toSet == expected.toSet)
  }

  test("bucketed layout: LWW merge of two co-bucketed stores shuffles " +
    "nothing on the probe side") {
    import org.apache.spark.sql.functions.col
    spark.sql("DROP TABLE IF EXISTS t_local")
    spark.sql("DROP TABLE IF EXISTS t_remote")
    // a previous failed run may have left the managed locations behind
    // without catalog entries; saveAsTable refuses to reuse them
    val wh = new java.io.File(
      sys.props("java.io.tmpdir") + "/graft_test_warehouse")
    Seq("t_local", "t_remote").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        d.listFiles().foreach(_.delete()); d.delete()
      }
    }
    TripleStore.writeBucketed(TripleStore.triples(spark, sf), "t_local", 4)
    TripleStore.writeBucketed(
      TripleStore.remoteChangelog(spark, sf), "t_remote", 4)
    // at test scale the planner would broadcast the small side; disable it
    // to get the sort-merge join a 100 TB merge would use, which is where
    // bucket co-location eliminates the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("t_local").join(spark.table("t_remote"),
        Seq("subject", "predicate"), "left_semi")
      val plan = joined.queryExecution.executedPlan.toString
      // co-bucketed + co-sorted => sort-merge join with zero Exchange
      assert(plan.contains("SortMergeJoin"), s"not a merge join:\n$plan")
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() > 0)
      // and an aggregation on the bucket key also avoids the shuffle
      val agg = spark.table("t_local").groupBy("subject", "predicate").count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("sharded point lookup: the scan outputs only the probed rows " +
    "(row-group skipping observed via scan metrics)") {
    val df = TripleStore.searchSharded(spark, sf, "<order_42>")
    assert(df.count() == 3)
    df.collect()
    // the scan metric counts rows surviving row-group/page min-max
    // skipping (row-level filtering happens in the Filter above it), so
    // "far fewer than the store" is what pruning guarantees here
    val scanRows = df.queryExecution.executedPlan.collectLeaves()
      .map(_.metrics.get("numOutputRows").map(_.value).getOrElse(0L)).sum
    val total = spark.read.parquet(TripleStore.shardedPath(spark, sf)).count()
    assert(total > 1000, s"store unexpectedly small: $total")
    assert(scanRows > 0 && scanRows < total / 2,
      s"scan emitted $scanRows of $total rows — no page skipping")
  }

  test("writeTsv/fromTsv round-trip preserves rows and timestamps") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_tsv_rt").resolve("out").toString
    val orig = TripleStore.updates(spark, sf)
    TripleStore.writeTsv(orig, dir)
    val back = TripleStore.fromTsv(spark, dir)
    assert(back.as[Triple].collect().toSet == orig.as[Triple].collect().toSet)
  }

  test("fromTsv: O15 bulk load parses reference-format timestamps") {
    val dir = Files.createTempDirectory("graft_tsv").toFile
    val f = new java.io.File(dir, "fixture.tsv")
    // reference smoke rows (MongoDBConnector.py:211, MasterServer.py:59-63);
    // initial bulk-load rows get datetime.min (MongoDBConnector.py:254)
    Files.writeString(f.toPath,
      "<Albert_Einstein>\t<hasWonPrize>\t<Nobel_Prize>\t2024-06-01 12:30:45.123456\n" +
      "<Steve_Pickell>\t<playsFor>\t<team_1>\t0001-01-01 00:00:00.000000\n")
    val rows = TripleStore.fromTsv(spark, f.getAbsolutePath)
      .as[Triple].collect().sortBy(_.subject)
    assert(rows.length == 2)
    assert(rows(0).subject == "<Albert_Einstein>" &&
      rows(0).ts_ms ==
        java.time.Instant.parse("2024-06-01T12:30:45.123Z").toEpochMilli)
    assert(rows(1).subject == "<Steve_Pickell>" && rows(1).ts_ms < 0)
  }
}
