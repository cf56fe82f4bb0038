package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `simhash_bits_xx64(words, bits)`: the cheap-hash SimHash family for
  * CORPUS-SCALE banding — bit k of the result is `'1'` iff
  *
  *   `sum over tokens t of ((xxhash64(k/64, t) >> (k%64)) & 1 = 1 ? +1 : -1)
  *    >= 0`
  *
  * i.e. dimension k draws bit `k mod 64` of ONE XXH64 round per
  * (token, 64 dims) — seeded exactly like the built-in `xxhash64(j, t)`
  * (`hashInt(j, 42)` folded into `hashUTF8String`), so the kernel is
  * pinnable against built-in expressions.
  *
  * This is the OFF-GATE twin of [[SimhashBits]] (VERDICT r21 #1): q20/q24
  * declare the md5 family and the DuckDB oracle recomputes it, so the gate
  * keeps md5 byte-for-byte — but at corpus scale the fingerprint pass is
  * pure MessageDigest arithmetic (the 10M-doc rehearsal's 64-bit SimHash
  * leg pays 2 md5 per token; one XXH64 round yields all 64 dims at ~10×
  * less arithmetic). Selectable ONLY through
  * [[graft.operators.Docs.simhashNeardupPairs]]'s corpus-scale `family`
  * dial (the `simBits`/`numBands` precedent). SimHash theory is
  * family-agnostic — each dimension needs an independent unbiased ±1 per
  * token, which any uniform 64-bit hash's bits provide — so the banding /
  * pigeonhole / hamming math carries over; NeardupScaleBench re-measures
  * planted recall at 10M docs.
  *
  * Edge semantics mirror [[SimhashBits]] exactly: a NULL token contributes
  * −1 to every dimension; an EMPTY token array yields all-'1' (every sum
  * is 0 ≥ 0); `bits` must be positive.
  */
case class SimhashBitsXx64(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(_: StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"simhash_bits_xx64 requires (array<string>, int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "simhash_bits_xx64"

  override def nullSafeEval(words: Any, bits: Any): Any =
    SimhashBitsXx64.simhash(
      words.asInstanceOf[ArrayData], bits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, b) =>
      s"graft.plans.SimhashBitsXx64.simhash($w, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimhashBitsXx64 =
    copy(left = newLeft, right = newRight)
}

object SimhashBitsXx64 {

  /** Per-group seeds j = 0 .. n-1 (group j covers dims 64j .. 64j+63),
    * derived as the built-in `xxhash64(j, t)` folds its first (int)
    * argument. Cached per width. */
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  private def seeds(n: Int): Array[Long] =
    seedCache.computeIfAbsent(n,
      n => Array.tabulate(n)(j => XXH64.hashInt(j, 42L)))

  /** One pass over the token array; called from generated code. */
  def simhash(words: ArrayData, bits: Int): UTF8String = {
    require(bits > 0, s"simhash_bits_xx64: non-positive width $bits")
    val nHashes = (bits + 63) / 64
    val sd = seeds(nHashes)
    val sums = new Array[Int](bits)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      if (words.isNullAt(i)) {
        // [[SimhashBits]]'s otherwise(-1) convention on a NULL token
        var k = 0
        while (k < bits) { sums(k) -= 1; k += 1 }
      } else {
        val t = words.getUTF8String(i)
        var j = 0
        while (j < nHashes) {
          val v = XXH64.hashUTF8String(t, sd(j))
          val base = 64 * j
          val lim = math.min(64, bits - base)
          var c = 0
          while (c < lim) {
            sums(base + c) += (if (((v >>> c) & 1L) == 1L) 1 else -1)
            c += 1
          }
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](bits)
    var k = 0
    while (k < bits) {
      out(k) = if (sums(k) >= 0) '1'.toByte else '0'.toByte
      k += 1
    }
    UTF8String.fromBytes(out)
  }
}
