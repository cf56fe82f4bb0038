package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.StableRound

/** The cross-engine rounding boundary, pinned (VERDICT r14 item 5's "a
  * fixture that would have caught the flip"): the double nearest 1.005 is
  * 1.00499999999999989…, which Spark's builtin `round(·, 2)` turns into
  * 1.01 (HALF_UP on the shortest decimal repr) while DuckDB's
  * scaled-binary round yields 1.00 (1.005·100 = 100.49999999999999, below
  * the half) — identical bits, different hashes. [[StableRound]]'s floor
  * form gives 1.00 in both engines; these tests pin the boundary value,
  * the Column/Scala/SQL-text agreement (including on the NaN/±inf/±huge
  * class the adversarial replay caught), and the sessionize kernel's
  * behavior ON a boundary-sum fixture. (2.675 is NOT such a boundary:
  * its scaled product rounds UP to exactly 267.5 in IEEE multiplication,
  * so every form — both builtins included — agrees on 2.68 there; the
  * first version of this spec assumed it diverged and was refuted by
  * running DuckDB on it.) */
class StableRoundSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("the .xx5 boundary double rounds DOWN under the stable form " +
    "(where Spark's builtin round goes UP — the documented divergence)") {
    val boundary = 1.005 // parses to 1.00499999999999989…
    assert(StableRound.stableRoundScala(boundary, 2) == 1.0)
    // the builtin's behavior, kept visible so a Spark upgrade that
    // changes RoundBase semantics is noticed here first
    import spark.implicits._
    val viaBuiltin = Seq(boundary).toDF("x")
      .select(round(col("x"), 2)).head().getDouble(0)
    assert(viaBuiltin == 1.01, s"Spark builtin round changed: $viaBuiltin")
    val viaStable = Seq(boundary).toDF("x")
      .select(StableRound.stableRound(col("x"), 2)).head().getDouble(0)
    assert(viaStable == 1.0)
    // the up-rounding .xx5 class: 2.675's scaled product IS 267.5 after
    // IEEE multiplication, so stable and builtin agree on 2.68 there
    assert(StableRound.stableRoundScala(2.675, 2) == 2.68)
  }

  test("Column form ≡ SQL-text form ≡ Scala form on boundary, plain, " +
    "negative, 4-digit AND non-finite/huge values; NULL propagates") {
    import spark.implicits._
    val vals = Seq(2.675, 2.67499999999999982, 1.005, -2.675, -1.0049,
      0.0, 123.456, 0.99995, -0.99995, 1e9 + 0.125,
      // the adversarial class: the unguarded floor form hashed these
      // 0.0-vs-NaN and 9.2e16-vs-inf between Spark and DuckDB
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      1e300, -1e300, Double.MaxValue,
      // the pass-through thresholds themselves and their neighborhoods:
      // 2^50 (d=2) / 2^48 (d=4), one ulp below, and the band between
      // them where d=2 still floors but d=4 passes through
      math.pow(2, 50), math.nextDown(math.pow(2, 50)),
      math.pow(2, 48), math.nextDown(math.pow(2, 48)),
      3.0e14, -3.0e14, 1.1e15, 4.5e15, 9.3e18, 5.0e19)
    for (d <- Seq(2, 4, 6, 9); v <- vals) {
      val fromCol = Seq(v).toDF("x")
        .select(StableRound.stableRound(col("x"), d),
          expr(StableRound.stableRoundSql("x", d)))
        .head()
      val scala = StableRound.stableRoundScala(v, d)
      // == is false for NaN == NaN; compare raw bits instead
      def bits(x: Double) = java.lang.Double.doubleToRawLongBits(x)
      assert(bits(fromCol.getDouble(0)) == bits(scala),
        s"column/scala mismatch at ($v, $d): ${fromCol.getDouble(0)}")
      assert(bits(fromCol.getDouble(1)) == bits(scala),
        s"sql-text/scala mismatch at ($v, $d): ${fromCol.getDouble(1)}")
    }
    val nullOut = Seq(Option.empty[Double]).toDF("x")
      .select(StableRound.stableRound(col("x"), 2),
        expr(StableRound.stableRoundSql("x", 2))).head()
    assert(nullOut.isNullAt(0) && nullOut.isNullAt(1))
  }

  test("pass-through is the mathematically rounded value: every double " +
    "at or above 2^(52-d) is a multiple of 2^-d, so d-decimal rounding " +
    "is the identity there") {
    for (d <- Seq(2, 4, 6, 9); v <- Seq(math.pow(2, 52 - d), 6.4e17,
        9.007199254740993e15)) {
      assert(StableRound.stableRoundScala(v, d) == v)
      // the claim itself: v's fractional structure terminates within d
      // decimals (v · 10^d is integral when computed exactly)
      assert(BigDecimal(v).setScale(d,
        BigDecimal.RoundingMode.HALF_UP).toDouble == v,
        s"$v is not d=$d-round-invariant")
    }
  }

  test("stableRoundSql emits the guarded formula the Column form computes") {
    assert(StableRound.stableRoundSql("x", 2) ==
      "CASE WHEN abs((x)) < 1125899906842624.0 " +
        "THEN (CASE WHEN abs((x) * 100.0 + 0.5) < 4503599627370496.0 " +
        "THEN floor((x) * 100.0 + 0.5) / 100.0 " +
        "ELSE ((x) * 100.0 + 0.5) / 100.0 END) ELSE (x) END")
    assert(StableRound.stableRoundSql("a + b", 4) ==
      "CASE WHEN abs((a + b)) < 281474976710656.0 " +
        "THEN (CASE WHEN abs((a + b) * 10000.0 + 0.5) < 4503599627370496.0 " +
        "THEN floor((a + b) * 10000.0 + 0.5) / 10000.0 " +
        "ELSE ((a + b) * 10000.0 + 0.5) / 10000.0 END) ELSE (a + b) END")
    intercept[IllegalArgumentException] {
      StableRound.stableRoundSql("x", 10) // beyond the gate's d <= 9 need
    }
  }

  test("the |v| >= 2^52 subcase emits the integral scaled value itself " +
    "(where the r15 long floor was the identity on it — value-identical)") {
    // d=2: x = 2^50 - 8 floors long-unsafely? no — v = x*100 + 0.5
    // ~ 1.1e17 >= 2^52, integral; the emitted value must be v/p exactly
    val x = math.pow(2, 50) - 8
    val v = x * 100.0 + 0.5
    assert(v >= math.pow(2, 52) && v == math.floor(v), "fixture not integral")
    assert(StableRound.stableRoundScala(x, 2) == v / 100.0)
    // d=9 (the TF-IDF inner round): plain small values floor normally
    assert(StableRound.stableRoundScala(1.2345678935, 9) == 1.234567894)
  }

  test("sessionize emits the stable-rounded sum on a boundary-sum " +
    "fixture (one event of value 1.005 → 1.0, not the builtin's 1.01)") {
    import spark.implicits._
    val ev = Seq((1L, 1L, 1.005, 1000L))
      .toDF("user_id", "event_id", "value", "ts_ms")
    val out = operators.Relational.sessionize(ev, gapMs = 60000L)
      .select("sum_value").as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(1.0)), s"kernel round not bit-stable: $out")
  }
}
