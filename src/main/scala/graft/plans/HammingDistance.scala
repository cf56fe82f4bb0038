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

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String].getBytes
    val y = b.asInstanceOf[UTF8String].getBytes
    val n = math.min(x.length, y.length)
    var d = math.abs(x.length - y.length).toLong
    var i = 0
    while (i < n) { if (x(i) != y(i)) d += 1; i += 1 }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |byte[] ${ev.value}_x = $a.getBytes();
         |byte[] ${ev.value}_y = $b.getBytes();
         |int ${ev.value}_n = Math.min(${ev.value}_x.length, ${ev.value}_y.length);
         |${ev.value} = Math.abs(${ev.value}_x.length - ${ev.value}_y.length);
         |for (int i = 0; i < ${ev.value}_n; i++) {
         |  if (${ev.value}_x[i] != ${ev.value}_y[i]) ${ev.value}++;
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}
