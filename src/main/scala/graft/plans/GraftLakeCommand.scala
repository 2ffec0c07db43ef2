package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.plans.logical.{Command, LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Deferred lake DML — the execution seam that kills the
  * execute-on-ANALYZE wart (r12 verdict #1): a `graft_*` procedure call
  * used to run its commit inside the table-function BUILDER, i.e. the
  * moment the statement was analyzed, so `EXPLAIN`, a notebook schema
  * preview, or `CREATE VIEW` over `graft_delete(...)` performed the
  * delete. Now the builder returns THIS leaf: analysis only names the
  * output columns; the side effect lives in `run`, forced exactly once
  * per query execution by [[GraftLakeCommandExec]]'s lazy result at
  * PHYSICAL execution time. `.explain()` plans and prints — commits
  * nothing; `.collect()` commits; collecting the SAME DataFrame twice
  * commits once (the QueryExecution caches one exec node whose lazy
  * result is shared); re-issuing the SQL statement is a fresh CALL and
  * commits again, the procedure contract. */
final case class GraftLakeCommand(procedure: String,
    override val output: Seq[Attribute],
    run: () => Seq[Seq[Long]]) extends LeafNode {
  // tiny one-row result: never the build side the optimizer should
  // weigh, and LeafNode's default computeStats throws
  override def computeStats(): Statistics = Statistics(sizeInBytes = 64)
  override def simpleString(maxFields: Int): String =
    s"GraftLakeCommand $procedure(${output.map(_.name).mkString(", ")})"
}

/** A rewritten top-level DML STATEMENT (`MERGE INTO` / `UPDATE` on a
  * lake catalog table): same deferred thunk, but marked [[Command]] so
  * the session executes it EAGERLY at `spark.sql(...)` — the semantics
  * every Spark command (and Delta's MERGE) has — while `EXPLAIN MERGE
  * INTO ...` still plans without committing (the engine analyzes
  * EXPLAIN bodies in skip-command mode). Returns no rows, like the
  * native v2 row-level commands. */
final case class GraftDmlStatement(statement: String,
    run: () => Unit) extends LeafNode with Command {
  override def simpleString(maxFields: Int): String =
    s"GraftDmlStatement $statement"
}

/** A maintenance STATEMENT (`OPTIMIZE` / `VACUUM`) — eager like every
  * command, but returning the procedure twin's one-row result
  * (version/n_files, dropped/deleted counts) so the operator sees what
  * the statement did, the Delta OPTIMIZE-metrics shape. */
final case class GraftMaintenanceResult(statement: String,
    override val output: Seq[Attribute],
    run: () => Seq[Seq[Long]]) extends LeafNode with Command {
  override def simpleString(maxFields: Int): String =
    s"GraftMaintenanceResult $statement"
}

/** Physical node for both shapes: the side effect fires once, inside
  * the lazily-initialized result — never at planning/EXPLAIN time. */
final case class GraftLakeCommandExec(procedure: String,
    override val output: Seq[Attribute],
    run: () => Seq[Seq[Long]]) extends LeafExecNode {

  private lazy val result: Array[InternalRow] =
    run().map(vals =>
      new GenericInternalRow(vals.toArray[Any]): InternalRow).toArray

  override def executeCollect(): Array[InternalRow] = result

  override protected def doExecute(): RDD[InternalRow] = {
    val rows = result
    sparkContext.parallelize(rows.toIndexedSeq, 1)
  }
}

/** Planner strategy mapping the deferred DML leaves to their exec. */
object GraftLakeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case c: GraftLakeCommand =>
      GraftLakeCommandExec(c.procedure, c.output, c.run) :: Nil
    case s: GraftDmlStatement =>
      GraftLakeCommandExec(s.statement, Nil,
        () => { s.run(); Seq.empty }) :: Nil
    case m: GraftMaintenanceResult =>
      GraftLakeCommandExec(m.statement, m.output, m.run) :: Nil
    case _ => Nil
  }
}

object GraftLakeCommand {
  /** A procedure result relation: `cols` name the (BIGINT) output
    * columns; `body` runs at execution and returns the single result
    * row. */
  def oneRow(procedure: String, cols: Seq[String])(
      body: () => Seq[Long]): GraftLakeCommand =
    GraftLakeCommand(procedure,
      cols.map(c => AttributeReference(c, LongType, nullable = false)()),
      () => Seq(body()))

  /** Idempotent strategy registration for an already-running session
    * (the extensions route covers session startup). */
  def registerStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(GraftLakeStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftLakeStrategy
}
