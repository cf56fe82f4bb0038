package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `window_mins(h, w)`: all `size(h) - w + 1` sliding-window minima of a
  * long array in ONE compiled O(L) pass (monotonic deque) — element j is
  * `array_min(slice(h, j + 1, w))`, exactly the winnowing fingerprint
  * stream q26 derives, so the swap is value-identical and the DuckDB
  * oracle carries over unchanged.
  *
  * Why a native expression (guide step 4 — no interpreted expressions in
  * the hot path): the replaced
  * `transform(sequence(0, size(h) - w), j -> array_min(slice(h, j+1, w)))`
  * is a CodegenFallback chain evaluated per window position — each of the
  * ~|text| positions allocates a fresh w-element slice and folds it, an
  * O(L·w) interpreted loop per document that made q26 the suite's most
  * expensive scan stage. The deque form is O(L) with zero per-position
  * allocation.
  *
  * Edge semantics:
  *  - NULL elements are ignored inside a window (array_min skips NULLs); a
  *    window holding ONLY NULLs yields a NULL minimum — both unreachable
  *    via `rolling_kgram_hashes`, which never emits NULL elements;
  *  - fewer than `w` elements yield an EMPTY array (the declarative form
  *    is only defined for size(h) >= w — q26 filters shorter docs out);
  *  - `w` must be positive (the function is SQL-registered).
  */
case class WindowMins(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"window_mins requires (array<bigint>, int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "window_mins"

  override def nullSafeEval(h: Any, w: Any): Any =
    WindowMins.mins(h.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, w) =>
      s"graft.plans.WindowMins.mins($h, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WindowMins =
    copy(left = newLeft, right = newRight)
}

object WindowMins {

  /** Monotonic-deque sliding minima; see the class doc. Called from
    * generated code. */
  def mins(h: ArrayData, w: Int): ArrayData = {
    require(w > 0, s"window_mins: non-positive window $w")
    val n = h.numElements()
    val m = n - w + 1
    if (m <= 0) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](m)
    // deque of indices with ascending values; NULL elements never enter
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < n) {
      if (!h.isNullAt(i)) {
        val v = h.getLong(i)
        while (tail > head && h.getLong(dq(tail - 1)) >= v) tail -= 1
        dq(tail) = i
        tail += 1
      }
      val start = i - w + 1
      if (start >= 0) {
        while (tail > head && dq(head) < start) head += 1
        out(start) = if (tail > head) Long.box(h.getLong(dq(head))) else null
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
