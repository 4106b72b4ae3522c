package graft.internal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.GraftBridge

/** Column <-> Catalyst Expression bridge (see GraftBridge for rationale). */
object Bridge {
  def column(e: Expression): Column = GraftBridge.column(e)
  def expression(c: Column): Expression = GraftBridge.expression(c)
}
