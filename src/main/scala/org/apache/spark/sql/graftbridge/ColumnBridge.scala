package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the Column class
  * backend-agnostic (ColumnNode) and fenced the classic converters behind
  * `private[sql]`; a library shipping native Catalyst expressions that
  * compose with arbitrary Columns (graft.functions.DotF) needs exactly
  * these two calls, so this one-file package hosts them inside the sql
  * namespace. No Spark internals are re-implemented — pure delegation. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
