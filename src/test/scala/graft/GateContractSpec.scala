package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-contract invariants of the gate roster itself — the
  * one place a coverage hole could open SILENTLY: a `queries` entry
  * without an `oracleSql` twin still runs, but the driver downgrades it
  * to a rows-only check (no hash compare), so the gate would look green
  * while verifying less. No Spark session needed; pure map checks. */
class GateContractSpec extends AnyFunSuite {

  test("every gate entry has an oracle twin and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o,
      s"queries-without-oracle=${(q -- o).toSeq.sorted} " +
        s"oracle-without-query=${(o -- q).toSeq.sorted} — a missing " +
        "oracle silently downgrades that entry to a rows-only check")
  }

  test("oracle SQL is runnable-shaped: non-empty, reads a table, and " +
    "is deterministic (ordered or single-row-safe aggregates)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      assert(sql.toUpperCase.contains("FROM"),
        s"$name: oracle reads no table:\n$sql")
    }
  }

  test("Verify rejects an unknown entry-name filter before any Spark work") {
    val ex = intercept[RuntimeException] {
      Verify.main(Array("/nonexistent", "/tmp/graft_never", "q999_nope"))
    }
    assert(ex.getMessage.contains("unknown gate entry 'q999_nope'"),
      s"wrong failure: ${ex.getMessage}")
  }

  test("gate names follow the stable q<N>_<slug> convention") {
    // the driver keys CORRECTNESS/BENCH artifacts by these names; a
    // rename breaks round-over-round comparability, so make one loud
    val pat = "q\\d+_[a-z0-9_]+".r
    val bad = SparkEntry.queries.keySet.filterNot(pat.matches)
    assert(bad.isEmpty, s"non-conforming gate names: ${bad.toSeq.sorted}")
  }
}
