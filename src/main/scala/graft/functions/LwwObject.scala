package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Q12: `lww_object` — a typed [[Aggregator]] implementing the reference's
  * LWW winner selection (O3, `MongoDBConnector.py:150`: newest timestamp
  * wins) as a custom aggregate function. Semantically `max_by(object,
  * struct(ts_ms, object))`; implemented as an `Aggregator` deliberately, to
  * exercise Spark's typed extension surface (SURVEY §2.2 UDAF bullet).
  *
  * Ties on `ts_ms` break by greatest `object` — the same deterministic
  * strengthening as [[graft.operators.Lww]], so both paths agree row-for-row.
  *
  * Scale: the buffer is one `(ts, object)` pair per group and `merge` is
  * associative+commutative, so Catalyst runs it as partial aggregation with
  * map-side combine — one shuffle of pre-combined winners, same shape as the
  * built-in `max_by` plan.
  */
object LwwObject
  extends Aggregator[(String, Long), (String, Long), String] {

  /** (object, ts_ms); ts = Long.MinValue marks "no input yet". */
  override def zero: (String, Long) = ("", Long.MinValue)

  // tie order must be UTF8String binary (graft.operators.Lww.newerWins),
  // NOT Scala's `b._1 > a._1` (UTF-16 code-unit) — the two diverge on
  // astral-vs-BMP object pairs and the gate oracle compares in UTF-8
  private def better(a: (String, Long), b: (String, Long)): (String, Long) =
    if (graft.operators.Lww.newerWins(a._1, a._2, b._1, b._2)) b else a

  override def reduce(buf: (String, Long), in: (String, Long)): (String, Long) =
    better(buf, in)

  override def merge(a: (String, Long), b: (String, Long)): (String, Long) =
    better(a, b)

  override def finish(buf: (String, Long)): String = buf._1

  override def bufferEncoder: Encoder[(String, Long)] =
    Encoders.tuple(Encoders.STRING, Encoders.scalaLong)

  override def outputEncoder: Encoder[String] = Encoders.STRING

  /** Untyped column form, usable in `DataFrame.agg` / SQL registration. */
  def column(obj: Column, tsMs: Column): Column = {
    implicit val inEnc: Encoder[(String, Long)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
    udaf(this).apply(obj, tsMs)
  }
}
