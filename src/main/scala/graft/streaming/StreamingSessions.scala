package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event inside a user's open session buffer. `value` is optional
  * because the batch twin's `sum(value)` IGNORES NULLs — dropping the whole
  * event (or zero-filling) would diverge from q39 on a corpus with null
  * values (the adversarial events table has them). */
case class SessionEvent(ts_ms: Long, event_id: Long, value: Option[Double])

/** A closed session. Identity is `(user_id, session_start)` — NOT a per-user
  * ordinal like the batch twin's `session_id`: an ordinal requires keeping a
  * per-user counter alive forever (state that can never be evicted), while
  * the start timestamp is derivable from the session itself, so state can be
  * dropped the moment a session closes. The batch/stream equivalence join is
  * on `(user_id, session_start)` (StreamingSessionsSpec). `user_id` is
  * optional — a NULL user is a legal grouping key that forms its own
  * session stream in BOTH engines (q39's window partitions NULLs into one
  * group); `sum_value` is None when every event in the session carried a
  * NULL value, matching SQL `sum` over an all-NULL group. */
case class ClosedSession(user_id: Option[Long], session_start: Long,
    session_end: Long, n_events: Long, sum_value: Option[Double])

/** Streaming twin of the batch gap-sessionizer
  * ([[graft.operators.Relational.q39Sessionize]]): close a user's session
  * after `gapMs` of event-time inactivity, tolerating out-of-order arrivals
  * up to the watermark.
  *
  * Shape: events are buffered per user in `flatMapGroupsWithState` and a
  * session is emitted only when the WATERMARK passes its end + gap — the
  * point after which no admissible arrival can extend or merge it. (Emitting
  * on the raw gap alone would be wrong under disorder: a late-but-admissible
  * event can land inside what looked like a gap and fuse two sessions.)
  * Appended output is therefore final — each closed session is emitted
  * exactly once, the append-mode contract.
  *
  * Scale: state per user is the not-yet-closable tail of their event stream
  * — bounded by watermark delay + burst length, NOT by history (closed
  * sessions leave state immediately; a fully idle user's state drains to
  * nothing via the event-time timeout). The one shuffle clusters by
  * user_id, mirroring the batch plan's single exchange.
  */
object StreamingSessions {

  /** Fold a (ts, event_id)-sorted buffer into gap-delimited sessions. */
  private[graft] def split(evs: Seq[SessionEvent],
      gapMs: Long): Seq[Seq[SessionEvent]] =
    evs.foldLeft(Vector.empty[Vector[SessionEvent]]) { (acc, e) =>
      if (acc.nonEmpty && e.ts_ms - acc.last.last.ts_ms <= gapMs)
        acc.init :+ (acc.last :+ e)
      else acc :+ Vector(e)
    }

  private def close(userId: Option[Long],
      s: Seq[SessionEvent]): ClosedSession = {
    // SQL-sum semantics: NULL addends ignored; all-NULL group sums to NULL.
    // `vs.sum` is the PINNED session-sum fold (r15): a 0.0-initialized
    // sequential left fold over the non-null values in (ts_ms, event_id)
    // order — the buffer is sorted before splitting, and the batch kernel
    // (Relational.sessionize) and the DuckDB oracle (q39Sql's ordered
    // list_sum) state the identical fold, so all three engines produce the
    // same BITS, not merely the same 2-decimal rounding
    // (StreamingSessionsSpec asserts the bit-exact equivalence).
    val vs = s.flatMap(_.value)
    ClosedSession(userId, s.head.ts_ms, s.last.ts_ms, s.size.toLong,
      if (vs.isEmpty) None else Some(vs.sum))
  }

  /** `events` needs columns `user_id LONG, event_id LONG, ts TIMESTAMP,
    * value DOUBLE` (the driver's events schema; user_id and value may be
    * NULL). Emits one row per closed session, append mode. */
  def sessionize(events: DataFrame, gapMs: Long,
      watermarkDelay: String): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[(Option[Long], Long, java.sql.Timestamp, Option[Double])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (userId: Option[Long],
         rows: Iterator[(Option[Long], Long, java.sql.Timestamp, Option[Double])],
         state: GroupState[Seq[SessionEvent]]) =>
          if (state.hasTimedOut) {
            // timeout fired ⇒ watermark passed lastTs + gap ⇒ EVERY buffered
            // session is closed; emit them all and drop the state row
            val out = split(state.get, gapMs).map(close(userId, _))
            state.remove()
            out.iterator
          } else {
            val buf = (state.getOption.getOrElse(Seq.empty) ++
                rows.map(r => SessionEvent(r._3.getTime, r._2, r._4)))
              .sortBy(e => (e.ts_ms, e.event_id))
            val wm = state.getCurrentWatermarkMs()
            // flush every session the watermark has sealed (end + gap behind
            // it — nothing admissible can reach it any more); keep the rest
            val (closed, open) = split(buf, gapMs)
              .partition(s => s.last.ts_ms + gapMs < wm)
            if (open.isEmpty) state.remove()
            else {
              val tail = open.flatten
              state.update(tail)
              // fire once no admissible event could extend the LAST session;
              // must stay ahead of the current watermark or Spark rejects it
              state.setTimeoutTimestamp(
                math.max(tail.last.ts_ms + gapMs + 1, wm + 1))
            }
            closed.map(close(userId, _)).iterator
          }
      }
  }
}
