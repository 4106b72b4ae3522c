package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Catalyst Expression bridge for Spark 4.x classic mode.
  *
  * Spark 4 rebased `Column` on `ColumnNode`; converting a raw Catalyst
  * `Expression` (our custom codegen expressions) to a user-facing `Column`
  * goes through `classic.ExpressionUtils`, which is `private[sql]` — hence
  * this one-file shim inside the `org.apache.spark.sql` package namespace.
  * Everything else in this project lives under `graft.*`.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
