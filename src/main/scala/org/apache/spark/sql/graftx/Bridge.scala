package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for the custom Catalyst expressions in
  * graft.functions. Spark 4 routes Column through ColumnNode, and the
  * conversion helpers are private[sql]; a subpackage bridge is the standard
  * way third-party Catalyst extensions wrap expressions as Columns.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
