package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the `private[sql]` `Dataset.ofRows` constructor (Spark 4
  * moved it behind `org.apache.spark.sql.classic`): rule code that must
  * continue building on an ALREADY-ANALYZED subtree with the Dataset
  * API — e.g. the deletion-vector anti-join rewrite, which wraps an
  * existing `LogicalRelation` node — needs a DataFrame over a plan, not
  * over a BaseRelation. Standard third-party-extension shim, same
  * pattern as [[GraftColumnBridge]]. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
