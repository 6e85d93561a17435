package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 made the Column <-> catalyst Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) private[sql]; custom
  * codegen'd expressions (graft.util.StateMap) still need the bridge, so
  * this one-file shim re-exports the two converters. No behavior — pure
  * visibility. */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
