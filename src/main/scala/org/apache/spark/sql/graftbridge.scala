package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge. Spark 4 moved the classic helpers
  * behind `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils)
  * so custom Catalyst expressions need a same-package shim to surface
  * as user-facing Columns.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
