package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_signature(shingles, numHashes)`: the document's full MinHash
  * signature in ONE compiled pass — element k (0-based) is
  *
  *   `min over shingles s of substring(md5('${k/4}:' || s), (k%4)*8 + 1, 8)`
  *
  * i.e. exactly the value the explode + `groupBy(doc_id).agg(min(...) × k)`
  * formulation aggregates (q19's signature stage), so swapping the plans is
  * value-identical and the DuckDB oracle carries over unchanged.
  *
  * Why a native expression (guide §2.3/§2.4 — shuffle fewer bytes, remove
  * shuffles outright): a MinHash signature is a PER-DOCUMENT function, but
  * the aggregate formulation explodes the corpus into its shingle stream
  * (~L rows per doc), projects `numHashes/4` md5 hex strings onto every
  * shingle row, and shuffles the whole stream into a k-way min hash
  * aggregate — at the 10M-doc rehearsal that stage was 890 s of the
  * 1,010 s banding wall (380M exploded rows through a 24-way min). This
  * expression computes the same minima map-only: zero exchange, zero
  * per-shingle string allocation (each md5 chunk is compared as an
  * unsigned 32-bit int — lowercase-hex lexicographic order IS unsigned
  * numeric order — and only the k winners are hex-formatted at the end).
  *
  * Semantics at the edges (mirroring the aggregate form):
  *  - NULL array elements are skipped (an md5 of NULL is NULL, and `min`
  *    ignores NULLs); an empty array — or one holding only NULLs — yields
  *    a NULL signature, as a doc with no shingle rows simply has no
  *    aggregate row.
  *  - `numHashes` must be a positive multiple of 4 (md5 quarters), the
  *    same tiling [[graft.operators.Docs.minhashCandidates]] requires —
  *    anything else raises loudly (the function is SQL-registered, so any
  *    literal can reach it).
  */
case class MinhashSignature(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(_: StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"minhash_signature requires (array<string>, int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  // NULL for an empty/all-NULL shingle set even when inputs are non-null
  override def nullable: Boolean = true

  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(shingles: Any, n: Any): Any =
    MinhashSignature.signature(
      shingles.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n) => {
      val tmp = ctx.freshName("mhsig")
      s"""org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.plans.MinhashSignature.signature($s, $n);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp; }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinhashSignature =
    copy(left = newLeft, right = newRight)
}

object MinhashSignature {

  private val Md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** `"$j:"` prefixes for hash family j = 0 .. nMd5-1, cached per width
    * (tiny; the gate uses one width per plan). */
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()

  private def prefixes(nMd5: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(nMd5,
      n => Array.tabulate(n)(j => s"$j:".getBytes("UTF-8")))

  private val HexDigits = "0123456789abcdef".getBytes("US-ASCII")

  /** One pass over the shingle array; see the class doc for the exact
    * aggregate-form equivalence. Called from generated code. */
  def signature(shingles: ArrayData, numHashes: Int): ArrayData = {
    require(numHashes > 0 && numHashes % 4 == 0,
      s"minhash_signature: $numHashes hashes must tile md5 quarters")
    val nMd5 = numHashes / 4
    val pfx = prefixes(nMd5)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, -1L) // sentinel: no non-null shingle seen
    val md = Md.get()
    val n = shingles.numElements()
    var i = 0
    var seen = false
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        seen = true
        val s = shingles.getUTF8String(i).getBytes
        var j = 0
        while (j < nMd5) {
          md.reset()
          md.update(pfx(j))
          md.update(s)
          val d = md.digest()
          var q = 0
          while (q < 4) {
            val v = ((d(4 * q) & 0xffL) << 24) | ((d(4 * q + 1) & 0xffL) << 16) |
              ((d(4 * q + 2) & 0xffL) << 8) | (d(4 * q + 3) & 0xffL)
            val k = 4 * j + q
            if (mins(k) == -1L || v < mins(k)) mins(k) = v
            q += 1
          }
          j += 1
        }
      }
      i += 1
    }
    if (!seen) return null
    val out = new Array[Any](numHashes)
    var k = 0
    while (k < numHashes) {
      val hex = new Array[Byte](8)
      val v = mins(k)
      var c = 0
      while (c < 8) {
        hex(c) = HexDigits(((v >>> (28 - 4 * c)) & 0xfL).toInt)
        c += 1
      }
      out(k) = UTF8String.fromBytes(hex)
      k += 1
    }
    new GenericArrayData(out)
  }
}
