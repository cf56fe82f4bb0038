package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_kgram_hashes(text, k)`: the polynomial hash of EVERY k-code-point
  * gram of `text`, computed with a Rabin–Karp rolling update — O(1) per
  * position, one pass over the document. Returns `array<bigint>` of length
  * `numCodePoints - k + 1` (empty when the text is shorter than `k`).
  *
  * Why a native expression: winnowing-style fingerprinting needs a hash per
  * CHARACTER position, and the declarative formulation (`md5(substring(...))`
  * per position) pays a full digest + string allocation per character —
  * measured 8.3 s for q26 at sf0.1, the whole suite's most expensive stage.
  * The rolling update is ~3 multiply-adds per position with zero per-position
  * allocation; at 100 TB of text that is the difference between an O(chars)
  * arithmetic pass and re-hashing every k-gram from scratch.
  *
  * Hash definition (shared verbatim by the DuckDB oracle, which computes the
  * SAME value as a direct 8-term sum): code points `c_i..c_{i+k-1}` hash to
  * `sum(c_{i+j} * 257^(k-1-j)) mod 1e9+7`, non-negative.
  */
case class RollingKgramHashes(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"rolling_kgram_hashes requires (string, int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_kgram_hashes"

  override def nullSafeEval(text: Any, k: Any): Any =
    RollingKgramHashes.hashes(text.asInstanceOf[UTF8String],
      k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) =>
      s"graft.plans.RollingKgramHashes.hashes($t, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RollingKgramHashes =
    copy(left = newLeft, right = newRight)
}

object RollingKgramHashes {

  val Mod = 1000000007L
  val Base = 257L

  /** `Base^e mod Mod` — the oracle twin embeds these as literals. */
  def modPow(e: Int): Long = {
    var r = 1L
    var i = 0
    while (i < e) { r = r * Base % Mod; i += 1 }
    r
  }

  /** Called from generated code. One code-point array per DOCUMENT (not per
    * gram), then a single rolling pass. */
  def hashes(text: UTF8String, k: Int): ArrayData = {
    require(k > 0, s"k-gram width must be positive, got $k")
    val cps = text.toString.codePoints().toArray
    val n = cps.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n)
    val bpK1 = modPow(k - 1)
    var h = 0L
    var i = 0
    while (i < cps.length) {
      h =
        if (i < k) (h * Base + cps(i)) % Mod
        else (((h - cps(i - k) * bpK1 % Mod + Mod) % Mod) * Base + cps(i)) % Mod
      if (i >= k - 1) out(i - k + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}
