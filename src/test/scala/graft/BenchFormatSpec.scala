package graft

import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** The bench stdout line is read by a harness that keeps only a 2,000-char
  * tail of the run's output, with sbt's `[success] Total time: ...`
  * trailer printed behind it — so the line must stay comfortably under
  * budget AT THE REAL GATE SIZE or the round's numbers are lost to a parse
  * failure (BENCH_r01–r10 all shipped `parsed: null`; length was one of
  * the two causes, sbt's since-removed `[info] ` logger prefix the other —
  * build.sbt's `run / outputStrategy := StdoutOutput` now emits the line
  * raw). No Spark session needed: this pins pure string rendering against
  * the actual `SparkEntry.queries` roster. */
class BenchFormatSpec extends AnyFunSuite {

  /** Non-line bytes sharing the tail window: the sbt success trailer
    * (~75 chars) and surrounding newlines, with headroom. */
  private val TailOverheadBudget = 100
  private val TailWindow = 2000

  // worst-case realistic medians: 3-digit seconds for every query
  private def healthy: Seq[Bench.Result] =
    SparkEntry.queries.keys.toSeq.sorted.map(q => (q, 999.994, 99L, 999L,
      Option.empty[String]))

  test("stdout line fits the harness tail window at the real gate size, " +
    "with worst-case 3-digit timings AND the close-total rider present") {
    val line = Bench.renderLine(healthy, "/root/testdata/sf0.1",
      Some(("99999.994", false, "worktree")))
    assert(line.length + TailOverheadBudget <= TailWindow,
      s"bench stdout line is ${line.length} chars — the ${TailWindow}-char " +
        "harness tail would truncate it (grow BENCH_DETAIL.json, not the " +
        "line; see BENCH_METHOD.md rule 8)")
  }

  test("stdout line is valid JSON with the contract keys, and omits the " +
    "errors map when healthy") {
    val line = Bench.renderLine(healthy, "/sf")
    val parsed = JsonMethods.parse(line)
    val keys = parsed.asInstanceOf[org.json4s.JObject].obj.map(_._1).toSet
    assert(keys == Set("metric", "value", "unit", "queries", "n_ok", "n_err",
      "sf"))
    val n = (parsed \ "queries").asInstanceOf[org.json4s.JObject].obj.size
    assert(n == SparkEntry.queries.size)
  }

  test("the close-total rider (r16): renderLine carries close_total + " +
    "close_counts_flat when a committed detail was parsed, and " +
    "parseCloseDetail round-trips renderDetail incl. the flatness " +
    "verdict on equal/unequal counts and roster drift") {
    val parsedLine = JsonMethods.parse(
      Bench.renderLine(healthy, "/sf", Some(("74.031", true, "head"))))
    assert((parsedLine \ "close_total") == org.json4s.JDouble(74.031))
    assert((parsedLine \ "close_counts_flat") == org.json4s.JBool(true))
    // the rider names its source so a committed-close comparison is
    // distinguishable from the non-repo working-tree fallback (ADVICE r17)
    assert((parsedLine \ "close_src") == org.json4s.JString("head"))
    // round-trip: the committed detail parses back to its own counts
    val Some((tot, jobs, stages)) =
      Bench.parseCloseDetail(Bench.renderDetail(healthy, "/sf"))
    assert(jobs.keySet == SparkEntry.queries.keySet && tot.nonEmpty)
    assert(healthy.forall { case (n, _, j, s, _) =>
      jobs(n) == j && stages(n) == s })
    // malformed content must degrade to None, never throw
    assert(Bench.parseCloseDetail("not json").isEmpty)
    assert(Bench.parseCloseDetail("""{"value":"x"}""").isEmpty)
  }

  test("line keys are INJECTIVE over the real roster (a collision would " +
    "silently merge two queries' timings) and abbreviate only unique " +
    "prefixes — colliding families keep their full names") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val keys = Bench.lineKeys(names)
    assert(keys.values.toSet.size == names.size,
      s"line-key collision: ${keys.groupBy(_._2).filter(_._2.size > 1)}")
    // unique-prefix names shorten to the prefix; the q5/q8 families (the
    // known prefix collisions) must keep their full names
    assert(keys("q77_media_dims") == "q77")
    assert(keys("q5_join_agg") == "q5_join_agg")
    assert(keys("q8_topk_group") == "q8_topk_group")
    // full names remain recoverable from the detail record, which never
    // abbreviates
    val detail = JsonMethods.parse(Bench.renderDetail(healthy, "/sf"))
    val detailKeys = (detail \ "queries")
      .asInstanceOf[org.json4s.JObject].obj.map(_._1).toSet
    assert(detailKeys == names.toSet)
  }

  test("a failed query surfaces in the line's errors map and is excluded " +
    "from the total") {
    val mixed = Seq[Bench.Result](
      ("q_ok", 1.5, 3L, 4L, None),
      ("q_bad", 0.01, 1L, 1L, Some("ClassCastException")))
    val line = Bench.renderLine(mixed, "/sf")
    val parsed = JsonMethods.parse(line)
    assert((parsed \ "n_err") == org.json4s.JInt(1))
    assert((parsed \ "errors" \ "q_bad") ==
      org.json4s.JString("ClassCastException"))
    assert((parsed \ "value") == org.json4s.JDouble(1.5))
  }

  test("line total equals the sum of the per-query values AS PRINTED, " +
    "across the adaptive-precision magnitude tiers") {
    // 0.004 prints "0.00", 123.456 prints "123.5" (1-decimal tier),
    // 0.006 prints "0.01" — value must be their sum (123.51), not the
    // rounded full-precision sum (123.466 → 123.47): ADVICE r11
    val rs = Seq[Bench.Result](
      ("a", 0.004, 1L, 1L, None),
      ("b", 123.456, 1L, 1L, None),
      ("c", 0.006, 1L, 1L, None))
    val parsed = JsonMethods.parse(Bench.renderLine(rs, "/sf"))
    assert((parsed \ "value") == org.json4s.JDouble(123.51))
    assert((parsed \ "queries" \ "b") == org.json4s.JDouble(123.5))
  }

  test("detail record parses and carries per-query jobs/stages at full " +
    "precision") {
    val detail = Bench.renderDetail(healthy, "/sf")
    val parsed = JsonMethods.parse(detail)
    val jobs = (parsed \ "jobs").asInstanceOf[org.json4s.JObject].obj.toMap
    val stages = (parsed \ "stages").asInstanceOf[org.json4s.JObject].obj
    assert(jobs.size == SparkEntry.queries.size)
    assert(stages.size == SparkEntry.queries.size)
    assert(jobs(SparkEntry.queries.keys.head) == org.json4s.JInt(99))
  }
}
