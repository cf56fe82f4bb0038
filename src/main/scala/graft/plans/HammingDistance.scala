package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `hamming_distance(a, b)`: number of differing byte positions of two
  * strings (plus the length difference) — used by the SimHash near-dup path
  * (q24) on '0'/'1' fingerprint strings.
  *
  * A native Catalyst `Expression` with `doGenCode`, not a Scala UDF: the
  * loop inlines into whole-stage codegen with zero boxing/serialization per
  * row — on a 100 TB candidate-pair join this sits in the hot path of every
  * comparison. (Preference order per the design notes: compose built-ins if
  * possible — a 32-way substring comparison would be — but a fused loop is
  * both faster and clearer.)
  */
case class HammingDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType.isInstanceOf[StringType]))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming_distance requires (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "hamming_distance"

  // numBytes/getByte read the backing memory directly — no per-row byte[]
  // copies in the candidate-join hot loop (getBytes would allocate two
  // arrays per comparison)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    val n = math.min(x.numBytes, y.numBytes)
    var d = math.abs(x.numBytes - y.numBytes).toLong
    var i = 0
    while (i < n) { if (x.getByte(i) != y.getByte(i)) d += 1; i += 1 }
    d
  }

  // the loop variable MUST be ctx.freshName: a literal `i` collides with
  // UnsafeProjection's `apply(InternalRow i)` parameter outside whole-stage
  // codegen (janino "Redefinition of local variable i" → silent interpreter
  // fallback)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = Math.min($a.numBytes(), $b.numBytes());
         |${ev.value} = Math.abs($a.numBytes() - $b.numBytes());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getByte($i) != $b.getByte($i)) ${ev.value}++;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}
