package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge to the `private[sql]` session state, so graft can register its
  * SQL functions into an existing session (the extensions route covers
  * session startup; this covers notebooks/REPLs attaching later). */
object GraftFunctionBridge {
  def register(spark: SparkSession, ident: FunctionIdentifier,
      info: ExpressionInfo, builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)

  def registerTable(spark: SparkSession, ident: FunctionIdentifier,
      info: ExpressionInfo,
      builder: Seq[Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.sessionState.tableFunctionRegistry
      .registerFunction(ident, info, builder)
}
