package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, EqualNullSafe, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeIntoTable, Project, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.{Column, GraftColumnBridge, GraftPlanBridge}

import graft.operators.{Export, Merge}
import graft.sources.GraftLakeTable

/** Native `MERGE INTO` / `UPDATE` SQL on lake catalog tables — the
  * first DML statements a warehouse user types, previously reachable
  * only through the `graft_merge` procedure's path+view calling
  * convention. A resolved [[MergeIntoTable]]/[[UpdateTable]] whose
  * target is a [[GraftLakeTable]] is rewritten (at analysis, like every
  * DSv2 row-level rewrite) into a deferred [[GraftDmlStatement]] whose
  * thunk routes to the AUDITED commit paths:
  *
  *  - MERGE with `layout ⊆ merge keys` →
  *    [[Export.mergeSnapshotPartitioned]] (cost follows the touched
  *    partitions, not the table);
  *  - MERGE otherwise → [[Merge.upsert]] + full-replace commit, the
  *    partition layout preserved when the table has one;
  *  - UPDATE → [[Export.updateWhere]], whose manifest-tag pruning
  *    rewrites only the files the predicate cannot exclude.
  *
  * Supported MERGE shape is the canonical upsert — `WHEN MATCHED THEN
  * UPDATE SET ... WHEN NOT MATCHED THEN INSERT ...` with an
  * equality-conjunction ON clause and matching UPDATE/INSERT values
  * (what `SET * / INSERT *` expand to). Anything else (conditioned
  * actions, DELETE actions, NOT MATCHED BY SOURCE, inequality ON) is
  * refused with a pointer to the procedure — never half-applied.
  * Execution is DEFERRED to the physical node ([[GraftDmlStatement]] is
  * a Command: `spark.sql` runs it eagerly, `EXPLAIN` plans it without
  * committing). */
final case class RewriteGraftLakeDml(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def lakeTableOf(plan: LogicalPlan): Option[GraftLakeTable] =
    plan.collectFirst {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftLakeTable] =>
        r.table.asInstanceOf[GraftLakeTable]
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case u: UpdateTable if u.resolved && lakeTableOf(u.table).isDefined =>
      rewriteUpdate(u, lakeTableOf(u.table).get)
    case m: MergeIntoTable
        if m.resolved && lakeTableOf(m.targetTable).isDefined =>
      rewriteMerge(m, lakeTableOf(m.targetTable).get)
  }

  /** Rebind a target-column expression by NAME, so the thunk can apply
    * it to the fresh snapshot frame it reads at execution time (the
    * analysis-time exprIds are tied to a relation instance that no
    * longer exists then). */
  private def unresolve(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  }

  private def asColumn(e: Expression): Column =
    GraftColumnBridge.column(unresolve(e))

  private def rewriteUpdate(u: UpdateTable,
      t: GraftLakeTable): LogicalPlan = {
    require(t.versionAsOf.isEmpty,
      s"cannot UPDATE time-travel relation ${t.name()} - a pinned " +
        "version is immutable by definition")
    val sets = u.assignments.map { a =>
      a.key match {
        case ar: AttributeReference => ar.name -> asColumn(a.value)
        case other => throw new UnsupportedOperationException(
          s"UPDATE ${t.name()}: assignment target must be a top-level " +
            s"column, got $other")
      }
    }
    val cond = u.condition.map(asColumn)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    val dir = t.dir
    GraftDmlStatement(s"UPDATE ${t.name()}", () => {
      Export.updateWhere(SparkSession.active, dir, sets, cond)
      ()
    })
  }

  private def rewriteMerge(m: MergeIntoTable,
      t: GraftLakeTable): LogicalPlan = {
    def refuse(what: String): Nothing =
      throw new UnsupportedOperationException(
        s"MERGE INTO ${t.name()}: $what. The supported SQL shape is " +
          "the canonical upsert - WHEN MATCHED THEN UPDATE SET ... " +
          "WHEN NOT MATCHED THEN INSERT ... with an equality ON " +
          "clause and matching UPDATE/INSERT values (SET * / INSERT " +
          "*); other shapes run through the graft_merge procedure")
    require(t.versionAsOf.isEmpty,
      s"cannot MERGE INTO time-travel relation ${t.name()}")
    if (m.withSchemaEvolution) refuse("WITH SCHEMA EVOLUTION is not " +
      "supported (ALTER TABLE ... ADD COLUMN first)")
    if (m.notMatchedBySourceActions.nonEmpty)
      refuse("WHEN NOT MATCHED BY SOURCE is not supported")
    val tOut = m.targetTable.outputSet
    val sOut = m.sourceTable.outputSet
    // the MATCHED-DELETE shape (`WHEN MATCHED THEN DELETE`, no insert):
    // an anti-join delete — rows whose key appears in the source vanish
    val deleteShape = (m.matchedActions, m.notMatchedActions) match {
      case (Seq(DeleteAction(None)), Seq()) => true
      case _ => false
    }
    // the INSERT-IF-ABSENT shape (`WHEN NOT MATCHED THEN INSERT` with
    // no matched action): an anti-join append — source keys already in
    // the table are skipped, the rest INSERT. O(batch) writes: one
    // key-pruned scan of the table's key columns + one append commit.
    val insertOnly = (m.matchedActions, m.notMatchedActions) match {
      case (Seq(), Seq(InsertAction(None, ia))) => Some(ia)
      case _ => None
    }
    val (updAssigns, insAssigns) =
      (m.matchedActions, m.notMatchedActions) match {
        case _ if deleteShape || insertOnly.nonEmpty => (Nil, Nil)
        case (Seq(UpdateAction(None, ua, _)), Seq(InsertAction(None, ia)))
            => (ua, ia)
        case _ => refuse("need exactly one unconditioned WHEN MATCHED " +
          "THEN UPDATE and one unconditioned WHEN NOT MATCHED THEN " +
          "INSERT (or a single WHEN MATCHED THEN DELETE, or a single " +
          "WHEN NOT MATCHED THEN INSERT)")
      }
    def sideOf(a: Expression, b: Expression)
        : Option[(AttributeReference, AttributeReference)] = (a, b) match {
      case (ta: AttributeReference, sa: AttributeReference)
          if tOut.contains(ta) && sOut.contains(sa) => Some((ta, sa))
      case (sa: AttributeReference, ta: AttributeReference)
          if tOut.contains(ta) && sOut.contains(sa) => Some((ta, sa))
      case _ => None
    }
    // ON clause: a conjunction of target-col = source-col equalities;
    // each pair is a merge key
    val keyPairs: Seq[(AttributeReference, AttributeReference)] =
      graft.sources.GraftLakeBatch.splitConjuncts(m.mergeCondition).map {
        case EqualTo(a, b) => sideOf(a, b).getOrElse(
          refuse(s"ON conjunct $a = $b is not a target-column = " +
            "source-column equality"))
        case EqualNullSafe(a, b) => sideOf(a, b).getOrElse(
          refuse(s"ON conjunct $a <=> $b is not a target-column = " +
            "source-column equality"))
        case other => refuse(s"ON clause has a non-equality conjunct: " +
          s"$other")
      }
    val keys = keyPairs.map(_._1.name)
    if (deleteShape) {
      // MERGE-DELETE: anti-join the target on the ON clause's key
      // columns (source keys projected under the target's names); a
      // partitioned table recommits partition-laid-out
      val keysPlan = Project(keyPairs.map { case (ta, sa) =>
        Alias(if (sa.dataType == ta.dataType) sa
          else Cast(sa, ta.dataType), ta.name)()
      }, m.sourceTable)
      val dir = t.dir
      return GraftDmlStatement(s"MERGE DELETE ${t.name()}", () => {
        val s = SparkSession.active
        val sourceKeys = GraftPlanBridge.ofRows(s, keysPlan).distinct()
        val latest = Export.latestSnapshotVersion(dir)
        require(latest > 0, s"nothing to merge into under $dir")
        val remaining = Export.readSnapshot(s, dir, latest)
          .join(sourceKeys, keys, "left_anti")
        val partCols = Export.snapshotPartitionColumns(dir, latest)
        if (partCols.nonEmpty)
          Export.replaceSnapshotPartitioned(s, remaining, dir, partCols)
        else Export.replaceSnapshot(s, remaining, dir)
        ()
      })
    }
    insertOnly.foreach { ia =>
      val ins = ia.map { a =>
        a.key match {
          case ar: AttributeReference => (ar: Attribute) -> a.value
          case other => refuse(s"INSERT assigns a non-top-level target " +
            s"$other")
        }
      }.toMap
      val projected = m.targetTable.output.map { ta =>
        val v = ins.getOrElse(ta, refuse(s"INSERT does not assign " +
          s"column '${ta.name}'"))
        if (v.references.exists(tOut.contains))
          refuse(s"the value of '${ta.name}' references target columns")
        keyPairs.find(_._1.semanticEquals(ta)).foreach { case (_, sa) =>
          if (!v.semanticEquals(sa))
            refuse(s"key column '${ta.name}' must be assigned the ON " +
              s"clause's source column ${sa.name}, got $v")
        }
        Alias(
          if (v.dataType == ta.dataType) v else Cast(v, ta.dataType),
          ta.name)()
      }
      val insPlan = Project(projected, m.sourceTable)
      val dir = t.dir
      return GraftDmlStatement(s"MERGE INSERT ${t.name()}", () => {
        val s = SparkSession.active
        val src = GraftPlanBridge.ofRows(s, insPlan)
        val latest = Export.latestSnapshotVersion(dir)
        require(latest > 0, s"nothing to merge into under $dir")
        // key-column-pruned scan of the table, broadcast-friendly
        // anti-join, append-only commit — never a table rewrite
        val existing = Export.readSnapshot(s, dir, latest)
          .select(keys.map(org.apache.spark.sql.functions.col): _*)
          .distinct()
        val fresh = src.join(existing, keys, "left_anti")
        val partCols = Export.snapshotPartitionColumns(dir, latest)
        if (partCols.nonEmpty)
          Export.appendSnapshotPartitioned(s, fresh, dir, partCols)
        else Export.appendSnapshot(s, fresh, dir)
        ()
      })
    }
    // every target column must be assigned, UPDATE and INSERT must
    // agree (Merge.upsert writes the same values on both paths), and a
    // key column's value must be the very source column the ON clause
    // joins on (otherwise the upsert's join key differs from the
    // written key)
    def byTarget(assigns: Seq[Assignment],
        what: String): Map[Attribute, Expression] =
      assigns.map { a =>
        a.key match {
          case ar: AttributeReference => (ar: Attribute) -> a.value
          case other => refuse(s"$what assigns a non-top-level target " +
            s"$other")
        }
      }.toMap
    val upd = byTarget(updAssigns, "UPDATE")
    val ins = byTarget(insAssigns, "INSERT")
    val projected = m.targetTable.output.map { ta =>
      val u = upd.getOrElse(ta, refuse(s"UPDATE does not assign " +
        s"column '${ta.name}'"))
      val i = ins.getOrElse(ta, refuse(s"INSERT does not assign " +
        s"column '${ta.name}'"))
      if (!u.semanticEquals(i))
        refuse(s"UPDATE and INSERT assign different values to " +
          s"'${ta.name}' ($u vs $i) - matched and inserted rows would " +
          "diverge, which full-row upsert cannot express")
      if (u.references.exists(tOut.contains))
        refuse(s"the value of '${ta.name}' references target columns " +
          s"($u) - only source-derived values are supported")
      keyPairs.find(_._1.semanticEquals(ta)).foreach { case (_, sa) =>
        if (!u.semanticEquals(sa))
          refuse(s"key column '${ta.name}' must be assigned the ON " +
            s"clause's source column ${sa.name}, got $u")
      }
      Alias(
        if (u.dataType == ta.dataType) u else Cast(u, ta.dataType),
        ta.name)()
    }
    val updatesPlan = Project(projected, m.sourceTable)
    val dir = t.dir
    GraftDmlStatement(s"MERGE INTO ${t.name()}", () => {
      val s = SparkSession.active
      val updates = GraftPlanBridge.ofRows(s, updatesPlan)
      val latest = Export.latestSnapshotVersion(dir)
      require(latest > 0, s"nothing to merge into under $dir")
      val partCols = Export.snapshotPartitionColumns(dir, latest)
      if (partCols.nonEmpty && partCols.toSet.subsetOf(keys.toSet))
        Export.mergeSnapshotPartitioned(s, dir, updates, keys, partCols)
      else {
        val merged = Merge.upsert(
          Export.readSnapshot(s, dir, latest), updates, keys)
        if (partCols.nonEmpty)
          Export.replaceSnapshotPartitioned(s, merged, dir, partCols)
        else Export.replaceSnapshot(s, merged, dir)
      }
      ()
    })
  }
}
