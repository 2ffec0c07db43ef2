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

  /** Free the block-manager storage behind a `localCheckpoint`ed plan
    * (r18, advisor finding): `Dataset.unpersist` only drops
    * cache-manager entries, so the blocks a local checkpoint persisted
    * otherwise live until RDD GC — a leak that accumulates across every
    * subquery-bearing DML in a long session. Walks the plan for the
    * `LogicalRDD` the checkpoint produced and unpersists its RDD
    * (non-blocking). Callers must be DONE evaluating the plan: a local
    * checkpoint has no lineage to recompute from.
    *
    * PRECONDITION (r19, advisor finding): every `LogicalRDD` in `plan`
    * must be one the CALLER checkpointed and owns — the walk unpersists
    * ALL of them, and a user-owned cached/checkpointed LogicalRDD
    * embedded in a wider plan would be destroyed unrecoverably. Current
    * callers pass exactly the checkpoint's own single-node plan; the
    * guard refuses anything wider so a future caller fails loudly
    * instead of silently eating someone else's blocks. */
  def unpersistLocalCheckpoint(plan: LogicalPlan): Unit = {
    val rdds = plan.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r
    }
    require(rdds.size <= 1,
      s"unpersistLocalCheckpoint: plan embeds ${rdds.size} LogicalRDDs - " +
        "pass the checkpoint's own plan (one LogicalRDD), not a " +
        "composite that may include RDDs the caller does not own")
    rdds.foreach(_.rdd.unpersist(blocking = false))
  }
}
