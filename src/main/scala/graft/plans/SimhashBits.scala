package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `simhash_bits(words, bits)`: the document's `bits`-wide SimHash
  * fingerprint in ONE compiled pass — bit k of the result is `'1'` iff
  *
  *   `sum over tokens t of (substring(md5_hex_{k/32}(t), k%32 + 1, 1) ∈
  *    {'8'..'f'} ? +1 : -1) >= 0`
  *
  * where `md5_hex_0(t) = md5(t)` and `md5_hex_j(t) = md5('j:' || t)` —
  * exactly the value [[graft.operators.Docs.simhashBits]]' explode +
  * `groupBy(doc_id).agg(sum × bits)` formulation computes, so the swap is
  * value-identical and q20/q24's DuckDB oracles carry over unchanged.
  *
  * Why a native expression (guide §2.3/§2.4): a SimHash is a PER-DOCUMENT
  * function, but the aggregate formulation explodes the corpus into its
  * token stream, projects `ceil(bits/32)` md5 hex strings per token row,
  * and shuffles the stream into a `bits`-way sum aggregate — all for a
  * map-only answer. This kernel inspects the digest BYTES directly (hex
  * char k is nibble k; `>= '8'` is its high bit), so it also skips the
  * 32-char hex-string materialization per token.
  *
  * Edge semantics (mirroring the aggregate form exactly):
  *  - a NULL token contributes −1 to every dimension: the replaced
  *    `when(substring(md5(t), …).isin('8'..'f'), 1).otherwise(-1)` sends a
  *    NULL hash down the `otherwise` branch (unreachable via `split`, which
  *    never emits NULL elements, but SQL can reach it);
  *  - an EMPTY token array yields all-'1' (every sum is 0 ≥ 0) — also
  *    unreachable via `split`, which returns at least one element;
  *  - `bits` must be positive (the function is SQL-registered).
  */
case class SimhashBits(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(_: StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"simhash_bits requires (array<string>, int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "simhash_bits"

  override def nullSafeEval(words: Any, bits: Any): Any =
    SimhashBits.simhash(words.asInstanceOf[ArrayData], bits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, b) =>
      s"graft.plans.SimhashBits.simhash($w, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimhashBits =
    copy(left = newLeft, right = newRight)
}

object SimhashBits {

  private val Md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** `"$j:"` salts for hash family j = 1 .. nHashes-1 (family 0 is the
    * UNsalted `md5(t)` the q20 gate fixes), cached per width. */
  private val saltCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()

  private def salts(nHashes: Int): Array[Array[Byte]] =
    saltCache.computeIfAbsent(nHashes,
      n => Array.tabulate(n)(j => s"$j:".getBytes("UTF-8")))

  /** One pass over the token array; see the class doc for the exact
    * aggregate-form equivalence. Called from generated code. */
  def simhash(words: ArrayData, bits: Int): UTF8String = {
    require(bits > 0, s"simhash_bits: non-positive width $bits")
    val nHashes = (bits + 31) / 32
    val slt = salts(nHashes)
    val sums = new Array[Int](bits)
    val md = Md.get()
    val n = words.numElements()
    var i = 0
    while (i < n) {
      if (words.isNullAt(i)) {
        // the aggregate form's otherwise(-1) on a NULL hash
        var k = 0
        while (k < bits) { sums(k) -= 1; k += 1 }
      } else {
        val t = words.getUTF8String(i).getBytes
        var j = 0
        while (j < nHashes) {
          md.reset()
          if (j > 0) md.update(slt(j))
          md.update(t)
          val d = md.digest()
          val base = 32 * j
          val lim = math.min(32, bits - base)
          var c = 0
          while (c < lim) {
            // hex char c of the digest = nibble c; '8'..'f' = high bit set
            val hi =
              if ((c & 1) == 0) (d(c >> 1) & 0x80) != 0
              else (d(c >> 1) & 0x08) != 0
            sums(base + c) += (if (hi) 1 else -1)
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
