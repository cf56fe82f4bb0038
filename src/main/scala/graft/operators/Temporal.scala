package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.TripleStore.table
import graft.functions.StableRound.{stableRound, stableRoundSql}

/** Temporal join operators — the two interval-shaped joins every
  * training-data pipeline eventually needs and Spark has no native operator
  * for: a range (interval-containment) join and a two-table as-of join.
  *
  * Both are built from primitives Catalyst DOES optimize, chosen so the
  * physical plan is a partitioned equi-join / single window shuffle rather
  * than the nested-loop fallback Spark produces for raw inequality join
  * conditions (a `BroadcastNestedLoopJoin` over 100 TB is a non-plan):
  *
  *  - [[rangeJoin]]: bin time into fixed-width buckets sized to the maximum
  *    interval length, replicate each interval to the (at most 2) buckets it
  *    overlaps, and equi-join on (keys, bucket) — the classic binned
  *    interval join. Candidate pairs are bounded by per-(key, bucket)
  *    co-occupancy, never |probe|×|intervals|.
  *  - [[asofJoin]]: tag both inputs, union them, and take
  *    `last(payload, ignoreNulls)` over an unbounded-preceding window keyed
  *    by the join keys and ordered by event time — ONE hash exchange total,
  *    no join node at all. The frame IS the "most recent right row at or
  *    before the left row" semantics (pandas `merge_asof` backward,
  *    `allow_exact_matches=true`).
  *
  * The reference engine has no temporal joins (its only read is the subject
  * point scan, `MongoDBConnector.py:26-43`); these close the capability gap
  * a pipeline user hits first when attributing events to windows or joining
  * features to the newest preceding annotation.
  */
object Temporal {

  /** Interval-containment join: rows of `probe` matched to rows of
    * `intervals` with equal `keys` and `timeCol` ∈ [startCol, endCol).
    *
    * Scale shape: `bucketWidth` must be ≥ the longest interval, so every
    * interval overlaps at most 2 buckets — each interval is replicated to
    * its covered buckets (one narrow `explode`), each probe row computes its
    * single bucket, and the join is a plain equi-join on (keys, bucket)
    * followed by the exact containment filter. Each qualifying (probe,
    * interval) pair meets in exactly one bucket, so no post-join dedup is
    * needed. Shuffle volume is |probe| + ~|intervals|, partitioned by a key
    * that spreads hot entities across time.
    *
    * Contract: time/start/end are non-negative epoch millis (long);
    * non-key column names of the two inputs must be disjoint; empty and
    * inverted intervals (end ≤ start) match nothing.
    */
  def rangeJoin(probe: DataFrame, intervals: DataFrame, keys: Seq[String],
      timeCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // floor-division through doubles is exact here: epoch-millis (~2^41)
    // stay far below the 2^53 double mantissa
    val w = lit(bucketWidth)
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_gbucket",
        explode(sequence(floor(col(startCol) / w).cast(LongType),
          floor((col(endCol) - 1) / w).cast(LongType))))
    probe
      .withColumn("_gbucket", floor(col(timeCol) / w).cast(LongType))
      .join(iv, keys :+ "_gbucket")
      .filter(col(timeCol) >= col(startCol) && col(timeCol) < col(endCol))
      .drop("_gbucket")
  }

  /** Backward as-of join: every `left` row gains the `payload` columns of
    * the most recent `right` row with the same `keys` and
    * `rightTime ≤ leftTime` (exact matches allowed), or nulls if none exists
    * within `toleranceMs` (`None` = unbounded lookback).
    *
    * Implementation: union the tagged inputs and run
    * `last(_, ignoreNulls = true)` over an unbounded-preceding window
    * ordered by (time, tag, tie) — right rows sort before left rows at equal
    * time, so an exactly-simultaneous right row is visible. The whole
    * operator is one hash exchange on `keys` (the closing projection adds
    * none); there is no join node, so there is nothing for Spark to
    * nested-loop. Per-key state during the window scan is O(1) rows — this
    * shape survives any corpus size whose single keys fit a partition.
    *
    * Contract: `leftTie`/`rightTie` make (time, tag, tie) a total order
    * (tie-break among equal-time right rows: LARGEST tie value wins);
    * payload columns must be non-null in `right` (each payload column is
    * carried independently, so a null payload value would fall through to
    * the previous right row); non-key column names disjoint as in
    * [[rangeJoin]].
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, leftTie: String, rightTie: String,
      payload: Seq[String], toleranceMs: Option[Long] = None): DataFrame = {
    val l = left
      .withColumn("_t", col(leftTime).cast(LongType))
      .withColumn("_tag", lit(1))
      .withColumn("_tie", col(leftTie).cast(LongType))
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).cast(LongType).as("_t"), lit(0).as("_tag"),
        col(rightTie).cast(LongType).as("_tie"),
        col(rightTime).cast(LongType).as("_rt")) ++ payload.map(col): _*)
    // left rows carry null payload/_rt, right rows null left-only columns
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*).orderBy("_t", "_tag", "_tie")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inTol = toleranceMs match {
      case Some(tol) => last(col("_rt"), ignoreNulls = true).over(w) >=
        col("_t") - lit(tol)
      case None => lit(true)
    }
    payload.foldLeft(u) { (df, p) =>
        df.withColumn(p, when(inTol, last(col(p), ignoreNulls = true).over(w)))
      }
      .filter(col("_tag") === 1)
      .drop("_t", "_tag", "_tie", "_rt")
  }

  // --- Q45: range join — attribute events to purchase windows --------------

  /** Each purchase opens a 24 h attribution window. */
  val AttributionWindowMs: Long = 24L * 3600 * 1000

  /** Q45: interval-containment join as a gate query — every purchase opens a
    * [ts, ts+24h) attribution window for its user; count and sum the user's
    * events landing inside each window (windows overlap when a user
    * purchases twice within 24 h, which the binned join handles and a
    * sessionize cannot). The purchase itself lands in its own window, so
    * every window yields a row. */
  def q45RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val e = ev.select(col("user_id"), col("event_id"), col("event_type"),
      col("value"), Relational.eventTsMs(ev).as("ts_ms"))
    val wins = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("win_id"),
        col("ts_ms").as("w_start"),
        (col("ts_ms") + AttributionWindowMs).as("w_end"))
    rangeJoin(e.select("user_id", "event_id", "value", "ts_ms"), wins,
        Seq("user_id"), "ts_ms", "w_start", "w_end", AttributionWindowMs)
      .groupBy("user_id", "win_id")
      .agg(count(lit(1)).as("n_events"),
        stableRound(sum(col("value")), 2).as("sum_value"))
      .orderBy("user_id", "win_id")
  }

  val q45Sql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, value,
       |         epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms
       |  FROM events),
       |p AS (
       |  SELECT user_id, event_id AS win_id, ts_ms AS w_start,
       |         ts_ms + $AttributionWindowMs AS w_end
       |  FROM e WHERE event_type = 'purchase')
       |SELECT p.user_id, p.win_id, CAST(count(*) AS BIGINT) AS n_events,
       |       ${stableRoundSql("sum(e.value)", 2)} AS sum_value
       |FROM p JOIN e ON p.user_id = e.user_id
       |             AND e.ts_ms >= p.w_start AND e.ts_ms < p.w_end
       |GROUP BY p.user_id, p.win_id
       |ORDER BY p.user_id NULLS FIRST, p.win_id""".stripMargin

  // --- Q46: as-of join — newest preceding purchase within tolerance --------

  /** Q46's lookback bound: a purchase older than 24 h attributes nothing. */
  val AsofToleranceMs: Long = 24L * 3600 * 1000

  /** Q46: two-table as-of join as a gate query — each non-purchase event
    * gains the user's most recent purchase (id + value) no older than 24 h,
    * or nulls. Distinct from q44 (single-stream attribute propagation):
    * here probe and build are separate relations joined by the generic
    * [[asofJoin]], and the tolerance bound is the parameter that a plain
    * unbounded window cannot express without carrying the matched time. */
  def q46AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val e = ev.select(col("user_id"), col("event_id"), col("event_type"),
      col("value"), Relational.eventTsMs(ev).as("ts_ms"))
    val probe = e.filter(col("event_type") =!= "purchase")
      .select("user_id", "event_id", "event_type", "ts_ms")
    val build = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ms"),
        col("event_id").as("purchase_id"),
        stableRound(col("value"), 2).as("purchase_value"))
    asofJoin(probe, build, Seq("user_id"), "ts_ms", "ts_ms",
        "event_id", "purchase_id",
        Seq("purchase_id", "purchase_value"), Some(AsofToleranceMs))
      .select("user_id", "event_id", "ts_ms", "event_type",
        "purchase_id", "purchase_value")
      .orderBy("user_id", "ts_ms", "event_id")
  }

  val q46Sql: String =
    s"""WITH u AS (
       |  SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS t, 1 AS tag,
       |         event_id AS tie, event_id, event_type,
       |         NULL::BIGINT AS p_id, NULL::DOUBLE AS p_val,
       |         NULL::BIGINT AS rt
       |  FROM events WHERE event_type <> 'purchase'
       |  UNION ALL
       |  SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)), 0,
       |         event_id, NULL, NULL,
       |         event_id, ${stableRoundSql("value", 2)},
       |         epoch_ms(CAST(ts AS TIMESTAMP))
       |  FROM events WHERE event_type = 'purchase'),
       |m AS (
       |  SELECT *,
       |         last_value(p_id IGNORE NULLS) OVER w AS m_id,
       |         last_value(p_val IGNORE NULLS) OVER w AS m_val,
       |         last_value(rt IGNORE NULLS) OVER w AS m_t
       |  FROM u WINDOW w AS (PARTITION BY user_id ORDER BY t, tag, tie
       |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT user_id, event_id, t AS ts_ms, event_type,
       |       CASE WHEN m_t >= t - $AsofToleranceMs THEN m_id END
       |         AS purchase_id,
       |       CASE WHEN m_t >= t - $AsofToleranceMs THEN m_val END
       |         AS purchase_value
       |FROM m WHERE tag = 1
       |ORDER BY user_id NULLS FIRST, ts_ms, event_id""".stripMargin
}
