package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters, so graft's
  * native Catalyst expressions can expose a public Column API. This is the
  * standard shim pattern for third-party Catalyst extensions (the converter
  * lives in `org.apache.spark.sql.classic.ExpressionUtils` in Spark 4).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The Column's FULLY-CONVERTED catalyst tree: a Column-API predicate
    * arrives as one opaque lazy `ColumnNodeExpression` wrapper whose
    * operator tree lives in ColumnNode space — useless to planning-side
    * inspection (manifest-tag pruning walks And/LessThan/... nodes).
    * Run the engine's own node→expression converter so both front
    * doors (SQL-parsed and Column-built) yield walkable trees. */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
