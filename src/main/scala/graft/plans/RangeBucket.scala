package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `range_bucket(key, sorted_boundaries)`: the index of the range a string
  * key falls into, i.e. the count of boundaries `<=` key — shard `k` holds
  * keys in `[boundaries(k-1), boundaries(k))`. The Spark twin of the
  * reference's `getShardID` routing table lookup (`MasterServer.py:77-87`),
  * as an expression usable on any column.
  *
  * A native Catalyst `Expression` doing a BINARY SEARCH over the boundary
  * array: a fold of `when`s is an O(#boundaries)-deep case tree per row
  * (a 1,024-shard store would codegen a 1,024-branch method), while this is
  * O(log n) comparisons inside one compact generated loop. Comparison is
  * `UTF8String.compare` — binary/code-point order, the same order Spark's
  * `>=` and range partitioner use — so the boundaries MUST be sorted in
  * code-point order (JVM `String.compareTo` diverges above the BMP; see
  * [[codePointOrdering]]).
  */
case class RangeBucket(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, ArrayType(_: StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"range_bucket requires (string, array<string>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "range_bucket"

  override def nullSafeEval(key: Any, bounds: Any): Any =
    RangeBucket.bucket(key.asInstanceOf[UTF8String],
      bounds.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (k, b) =>
      s"graft.plans.RangeBucket.bucket($k, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RangeBucket =
    copy(left = newLeft, right = newRight)
}

object RangeBucket {

  /** Shard-id Column for `key` against `boundaries` (cut points): shard k
    * holds keys in `[boundaries(k-1), boundaries(k))`. Sorts the boundaries
    * in code-point order internally, which makes it a drop-in for the old
    * fold-of-`when`s (counting boundaries `<= key` is order-independent)
    * while generating an O(log n) loop instead of an O(n) case tree.
    * Requires `range_bucket` registered in the session ([[GraftExtensions]]
    * — installed by every entry point in this repo). */
  def shardId(key: org.apache.spark.sql.Column,
      boundaries: Seq[String]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{call_function, typedlit}
    call_function("range_bucket", key,
      typedlit(boundaries.sorted(codePointOrdering)))
  }

  /** Upper-bound binary search: first index whose boundary is `> key`
    * == count of non-null boundaries `<= key`. Called from generated code.
    * A null boundary element orders LAST (never counts as `<= key`) —
    * exactly where Spark's `array_sort` places nulls — so feeding
    * `array_sort` output with trailing nulls preserves the sorted invariant
    * and degrades gracefully instead of NPE-ing inside generated code. */
  def bucket(key: UTF8String, bounds: ArrayData): Int = {
    var lo = 0
    var hi = bounds.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val b = bounds.getUTF8String(mid)
      if (b != null && b.compareTo(key) <= 0) lo = mid + 1
      else hi = mid
    }
    lo
  }

  /** Code-point string ordering — identical to Spark's binary UTF-8 `>=`
    * (and Python's, which the reference's `<₩uNo>` boundary relies on);
    * JVM `String.compareTo` is UTF-16 code-unit order and diverges above
    * the BMP, so boundary lists must be sorted with THIS before feeding
    * [[RangeBucket]] or `repartitionByRange`-adjacent logic. */
  val codePointOrdering: Ordering[String] = (a: String, b: String) => {
    val (x, y) = (a.codePoints.toArray, b.codePoints.toArray)
    val n = math.min(x.length, y.length)
    var i = 0
    var r = 0
    while (r == 0 && i < n) { r = Integer.compare(x(i), y(i)); i += 1 }
    if (r != 0) r else Integer.compare(x.length, y.length)
  }
}
