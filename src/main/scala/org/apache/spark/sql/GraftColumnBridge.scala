package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column ↔ Expression conversion (Spark 4
  * moved `Column` onto ColumnNode internals; `classic.ExpressionUtils` is
  * the supported conversion point but is sql-private). Needed exactly once
  * in the engine: [[graft.plans.NearestCentroidBc]] carries a BROADCAST
  * VARIABLE inside the expression (a handle no SQL-registered function
  * constructor can receive), so its Column must be built directly from the
  * expression object. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
