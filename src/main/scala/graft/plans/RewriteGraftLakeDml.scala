package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, EqualNullSafe, EqualTo, Expression, ExprId, GetStructField}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, LogicalPlan, MergeIntoTable, OverwritePartitionsDynamic, Project, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreePattern.COMMAND
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{coalesce, col, lit, when}
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, GraftPlanBridge}

import graft.operators.{Export, Merge}
import graft.sources.GraftLakeTable

/** Native `MERGE INTO` / `UPDATE` SQL on lake catalog tables — the
  * first DML statements a warehouse user types. A resolved
  * [[MergeIntoTable]]/[[UpdateTable]] whose target is a
  * [[GraftLakeTable]] is rewritten (at analysis, like every DSv2
  * row-level rewrite) into a deferred [[GraftDmlStatement]] whose thunk
  * routes to the AUDITED commit paths. Fast paths keep their scoped
  * commits; everything else takes the GENERAL merge:
  *
  *  - canonical upsert (`WHEN MATCHED THEN UPDATE SET * WHEN NOT
  *    MATCHED THEN INSERT *` shapes) with `layout ⊆ merge keys` →
  *    [[Export.mergeSnapshotPartitioned]] (cost follows the touched
  *    partitions), otherwise [[Merge.upsert]] + full-replace;
  *  - `WHEN MATCHED THEN DELETE` → anti-join delete, PARTITION-SCOPED
  *    ([[Export.deleteSnapshotPartitioned]]) when `layout ⊆ keys`, or
  *    ZONE-SCOPED ([[Export.rewriteSnapshotZoneScoped]]) on an
  *    unpartitioned table clustered on a merge key;
  *  - `INSERT OVERWRITE` under dynamic partition-overwrite mode →
  *    [[rewriteDynamicOverwrite]]: replace exactly the touched
  *    partitions, carry the rest verbatim;
  *  - `WHEN NOT MATCHED THEN INSERT` only → anti-join append whose
  *    existing-keys scan is ENVELOPE-PRUNED
  *    ([[Export.snapshotKeysOverlapping]]) — O(overlapping files),
  *    never a table rewrite;
  *  - conditioned / mixed actions (`WHEN MATCHED AND c THEN
  *    UPDATE/DELETE`, multiple clauses, `WHEN NOT MATCHED BY SOURCE`)
  *    → the general first-true-clause rewrite ([[rewriteMergeGeneral]]):
  *    one outer join + per-clause CASE resolution, full SQL MERGE
  *    semantics including the duplicate-source-key cardinality error;
  *  - UPDATE → [[Export.updateWhere]] (manifest-tag-pruned rewrite) or,
  *    when the table property `graft.update.mode=mor` is set,
  *    [[Export.updateWhereMoR]] (deletion vectors + an O(matched)
  *    insert epoch — zero files rewritten).
  *
  * `WITH SCHEMA EVOLUTION` is native: the target declares
  * `AUTOMATIC_SCHEMA_EVOLUTION`, so the analyzer's own
  * `ResolveMergeIntoSchemaEvolution` lands the source-minus-target
  * column delta through the catalog's metadata-only ADD COLUMN /
  * safe-widen commits BEFORE this rule fires (the rule skips while
  * `needSchemaEvolution` holds). Struct-field assignment targets
  * (`SET meta.score = v`, r14) fold into whole-column `withField`
  * rebuilds, so UPDATE and every MERGE UPDATE clause accept them.
  * Still refused loudly (never half-applied): time-travel targets,
  * non-equality ON conjuncts, an ON clause binding one target column
  * to DIFFERENT source expressions, overlapping assignments to one
  * root column, and nested INSERT targets (no base row to rebuild).
  * Execution is DEFERRED to the
  * physical node ([[GraftDmlStatement]] is a Command: `spark.sql` runs
  * it eagerly, `EXPLAIN` plans it without committing). The rule itself
  * is O(1) on non-DML statements: commands carry the COMMAND tree
  * pattern, so the 99% of analyzer fixpoint passes over ordinary
  * queries exit on one cached-bitset check without traversing. */
final case class RewriteGraftLakeDml(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def lakeTableOf(plan: LogicalPlan): Option[GraftLakeTable] =
    plan.collectFirst {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftLakeTable] =>
        r.table.asInstanceOf[GraftLakeTable]
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!plan.containsPattern(COMMAND)) plan
    else plan.transformUpWithPruning(_.containsPattern(COMMAND)) {
      case u: UpdateTable if u.resolved && lakeTableOf(u.table).isDefined =>
        rewriteUpdate(u, lakeTableOf(u.table).get)
      case m: MergeIntoTable
          if m.resolved && !m.needSchemaEvolution &&
            lakeTableOf(m.targetTable).isDefined =>
        // `WITH SCHEMA EVOLUTION` with a pending column delta is left
        // for the analyzer's own ResolveMergeIntoSchemaEvolution (the
        // table declares AUTOMATIC_SCHEMA_EVOLUTION, so that rule adds
        // the new columns through the catalog's metadata-only
        // alterTable commits and clears needSchemaEvolution); the next
        // fixpoint pass lands here with the evolved target
        rewriteMerge(m, lakeTableOf(m.targetTable).get)
      case d: DeleteFromTable
          if d.resolved && lakeTableOf(d.table).isDefined =>
        rewriteDelete(d, lakeTableOf(d.table).get)
      case o: OverwritePartitionsDynamic
          if o.resolved && lakeTableOf(o.table).isDefined =>
        rewriteDynamicOverwrite(o, lakeTableOf(o.table).get)
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

  /** An assignment target normalized to (root column, struct path):
    * `SET meta.quality.score = v` → (meta, [quality, score]). Only
    * pure struct-field chains rooted at a top-level column qualify —
    * array/map element targets have no in-place rewrite. The analyzer
    * already resolved the chain, so the path provably exists and
    * `key.dataType` is the leaf's committed type. */
  private def targetPath(k: Expression)
      : Option[(AttributeReference, Seq[String])] = k match {
    case ar: AttributeReference => Some((ar, Nil))
    case g: GetStructField => targetPath(g.child).map {
      case (ar, p) => (ar, p :+ g.extractFieldName) }
    case _ => None
  }

  /** Fold one root column's assignments into ONE whole-column value, so
    * every commit path below keeps operating on top-level columns. A
    * whole-column assignment must be alone for its root, and nested
    * paths must not overlap (the SQL duplicate-assignment law —
    * `SET meta = ..., meta.score = ...` has no defined order); field
    * assignments rebuild the struct in place via `withField`, so a
    * NULL struct stays NULL — no phantom partial rows invented. */
  private def foldAssignments(root: String, base: Column,
      items: Seq[(Seq[String], Column)],
      refuse: String => Nothing): Column =
    if (items.exists(_._1.isEmpty)) {
      if (items.size > 1)
        refuse(s"column '$root' is assigned more than once")
      items.head._2
    } else {
      items.map(_._1).combinations(2).foreach { pair =>
        val (a, b) = (pair.head, pair(1))
        if (a.startsWith(b) || b.startsWith(a))
          refuse(s"conflicting assignments under '$root': paths " +
            s"${a.mkString(".")} and ${b.mkString(".")} overlap")
      }
      items.foldLeft(base) { case (acc, (p, v)) =>
        p.foreach(n => if (n.contains(".") || n.contains("`"))
          refuse(s"struct field '$n' under '$root' cannot be " +
            "addressed by a dotted path (name contains '.' or '`')"))
        acc.withField(p.mkString("."), v)
      }
    }

  private def rewriteUpdate(u: UpdateTable,
      t: GraftLakeTable): LogicalPlan = {
    require(t.versionAsOf.isEmpty,
      s"cannot UPDATE time-travel relation ${t.name()} - a pinned " +
        "version is immutable by definition")
    def refuse(msg: String): Nothing =
      throw new UnsupportedOperationException(s"UPDATE ${t.name()}: $msg")
    val triples = u.assignments.map { a =>
      targetPath(a.key) match {
        // leaf-cast to the committed field type, so the struct the
        // withField fold rebuilds keeps its committed shape exactly
        case Some((ar, p)) =>
          (ar.name, p, asColumn(a.value).cast(Export.nullableType(a.key.dataType)))
        case None => refuse("assignment target must be a top-level " +
          s"column or a struct-field path over one, got ${a.key}")
      }
    }
    val sets = triples.groupBy(_._1).toSeq.map { case (root, items) =>
      root -> foldAssignments(root, col(root),
        items.map(i => (i._2, i._3)), refuse)
    }
    val cond = u.condition.map(asColumn)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    val dir = t.dir
    GraftDmlStatement(s"UPDATE ${t.name()}", () => {
      // table-property routing, read at EXECUTION time so an ALTER
      // between analysis and run is honored: `graft.update.mode=mor`
      // takes the deletion-vector path (O(matched) writes) instead of
      // the copy-on-write file rewrite
      val mor = Export.snapshotProperties(dir)
        .get("graft.update.mode").contains("mor")
      if (mor) Export.updateWhereMoR(SparkSession.active, dir, sets, cond)
      else Export.updateWhere(SparkSession.active, dir, sets, cond)
      ()
    })
  }

  /** Native `DELETE FROM` with ANY predicate — the v2 `SupportsDelete`
    * route only accepts source-Filter-translatable conjuncts (an
    * expression like `doc_id % 3 = 0` refused outright); this rewrite
    * hands the FULL condition to the audited manifest-pruned deletes.
    * `graft.delete.mode=mor` routes the deletion-vector path (zero
    * files rewritten, O(matched) positions) exactly like the UPDATE
    * property. Same deferred contract: `EXPLAIN DELETE` commits
    * nothing. */
  private def rewriteDelete(d: DeleteFromTable,
      t: GraftLakeTable): LogicalPlan = {
    require(t.versionAsOf.isEmpty,
      s"cannot DELETE FROM time-travel relation ${t.name()} - a " +
        "pinned version is immutable by definition")
    val cond = asColumn(d.condition)
    val dir = t.dir
    GraftDmlStatement(s"DELETE FROM ${t.name()}", () => {
      val mor = Export.snapshotProperties(dir)
        .get("graft.delete.mode").contains("mor")
      if (mor) Export.deleteWhereMoR(SparkSession.active, dir, cond)
      else Export.deleteWhere(SparkSession.active, dir, cond)
      ()
    })
  }

  /** DYNAMIC partition overwrite (`INSERT OVERWRITE` under
    * `spark.sql.sources.partitionOverwriteMode=dynamic`, and
    * `df.writeTo(t).overwritePartitions()`): replace EXACTLY the
    * partitions the incoming rows land in, carrying every other
    * partition's files verbatim — at 100 TB an hourly re-load of one
    * day's partitions costs those partitions, never the table. The v2
    * exec for this plan requires a true BatchWrite, which the lake's
    * deliberate V1 write seam doesn't build, so the statement routes
    * here instead: a deferred [[GraftDmlStatement]] committing
    * [[Export.replaceSnapshotPartitionsScoped]] over the touched
    * tuples (one tiny driver distinct over the batch's partition
    * columns). An unpartitioned table degrades to the full replace —
    * the SQL semantics when there is no partitioning to scope by. */
  private def rewriteDynamicOverwrite(o: OverwritePartitionsDynamic,
      t: GraftLakeTable): LogicalPlan = {
    require(t.versionAsOf.isEmpty,
      s"cannot INSERT OVERWRITE time-travel relation ${t.name()} - a " +
        "pinned version is immutable by definition")
    // the analyzer has already aligned the query's output to the table
    // columns (order and type); re-alias by position so the thunk's
    // frame carries the table's column names
    val projected = Project(o.query.output.zip(o.table.output).map {
      case (q, ta) => Alias(
        if (q.dataType == ta.dataType) q else Cast(q, ta.dataType),
        ta.name)()
    }, o.query)
    val dir = t.dir
    GraftDmlStatement(s"INSERT OVERWRITE DYNAMIC ${t.name()}", () => {
      val s = SparkSession.active
      val df = GraftPlanBridge.ofRows(s, projected)
      val partCols = Export.declaredPartitionColumns(dir)
      if (partCols.isEmpty) Export.replaceSnapshot(s, df, dir)
      else {
        val touched: Set[Seq[String]] =
          df.select(partCols.map(c => col(c).cast("string")): _*)
            .distinct().collect()
            .map(r => partCols.indices.map(i => r.getString(i))
              : Seq[String]).toSet
        // empty source: dynamic overwrite touches nothing (the SQL
        // law), so nothing commits
        if (touched.nonEmpty)
          Export.replaceSnapshotPartitionsScoped(s, df, dir, partCols,
            touched, meta = Map(
              "overwritten_partitions" -> touched.size.toString))
      }
      ()
    })
  }

  /** Thrown internally when a MERGE doesn't fit a scoped fast path —
    * caught to fall through to the general rewrite, never surfaced. */
  private object NotCanonical
      extends Exception with scala.util.control.NoStackTrace
  private def miss(): Nothing = throw NotCanonical
  private def canonical(body: => LogicalPlan): Option[LogicalPlan] =
    try Some(body) catch { case NotCanonical => None }

  private def rewriteMerge(m: MergeIntoTable,
      t: GraftLakeTable): LogicalPlan = {
    def refuse(what: String): Nothing =
      throw new UnsupportedOperationException(
        s"MERGE INTO ${t.name()}: $what. Supported: equality ON " +
          "clauses with any combination of (conditioned) WHEN MATCHED " +
          "UPDATE/DELETE, WHEN NOT MATCHED INSERT, and WHEN NOT " +
          "MATCHED BY SOURCE UPDATE/DELETE clauses")
    require(t.versionAsOf.isEmpty,
      s"cannot MERGE INTO time-travel relation ${t.name()}")
    val tOut = m.targetTable.outputSet
    val sOut = m.sourceTable.outputSet
    def sideOf(a: Expression, b: Expression)
        : Option[(AttributeReference, AttributeReference)] = (a, b) match {
      case (ta: AttributeReference, sa: AttributeReference)
          if tOut.contains(ta) && sOut.contains(sa) => Some((ta, sa))
      case (sa: AttributeReference, ta: AttributeReference)
          if tOut.contains(ta) && sOut.contains(sa) => Some((ta, sa))
      case _ => None
    }
    // ON clause: a conjunction of target-col = source-col equalities;
    // each pair is a merge key (`<=>` keeps its null-matching semantics
    // through the general path's join)
    val rawConds: Seq[(AttributeReference, AttributeReference, Boolean)] =
      graft.sources.GraftLakeBatch.splitConjuncts(m.mergeCondition).map {
        case EqualTo(a, b) => sideOf(a, b).map { case (ta, sa) =>
            (ta, sa, false) }.getOrElse(
          refuse(s"ON conjunct $a = $b is not a target-column = " +
            "source-column equality"))
        case EqualNullSafe(a, b) => sideOf(a, b).map { case (ta, sa) =>
            (ta, sa, true) }.getOrElse(
          refuse(s"ON conjunct $a <=> $b is not a target-column = " +
            "source-column equality"))
        case other => refuse(s"ON clause has a non-equality conjunct: " +
          s"$other")
      }
    // one pair per target column: duplicate conjuncts binding the SAME
    // source column collapse (EqualTo wins over <=> — their conjunction
    // is the plain equality); different sources are refused, because
    // any single-join rewrite would silently drop one equality and
    // match rows SQL MERGE would not
    val keyConds: Seq[(AttributeReference, AttributeReference, Boolean)] =
      rawConds.map(_._1.exprId).distinct.map { id =>
        val group = rawConds.filter(_._1.exprId == id)
        if (!group.forall(_._2.semanticEquals(group.head._2)))
          refuse(s"target column '${group.head._1.name}' appears in " +
            "multiple ON conjuncts bound to DIFFERENT source columns " +
            s"(${group.map(_._2.name).distinct.mkString(", ")}) - a " +
            "single-key rewrite would drop one of the equalities")
        (group.head._1, group.head._2, group.forall(_._3))
      }

    // ---- fast paths: each claims only its exact shape, else misses
    canonical(rewriteMergeDelete(m, t, keyConds, refuse))
      .orElse(canonical(rewriteMergeInsertOnly(m, t, keyConds, refuse)))
      .orElse(canonical(rewriteMergeUpsert(m, t, keyConds, refuse)))
      .getOrElse(rewriteMergeGeneral(m, t, keyConds, refuse))
  }

  /** `WHEN MATCHED THEN DELETE` (alone, unconditioned): an anti-join
    * delete — rows whose key appears in the source vanish. With
    * `layout ⊆ keys` the rewrite is PARTITION-SCOPED
    * ([[Export.deleteSnapshotPartitioned]]): only partitions present in
    * the source keys rewrite, the rest carry verbatim — a MERGE-DELETE
    * keyed on the layout costs the touched partitions at 100 TB, not
    * the table. */
  private def rewriteMergeDelete(m: MergeIntoTable, t: GraftLakeTable,
      keyConds: Seq[(AttributeReference, AttributeReference, Boolean)],
      refuse: String => Nothing): LogicalPlan = {
    (m.matchedActions, m.notMatchedActions,
        m.notMatchedBySourceActions) match {
      case (Seq(DeleteAction(None)), Seq(), Seq()) => ()
      case _ => miss()
    }
    val keys = keyConds.map(_._1.name)
    val keysPlan = Project(keyConds.map { case (ta, sa, _) =>
      Alias(if (sa.dataType == ta.dataType) sa
        else Cast(sa, ta.dataType), ta.name)()
    }, m.sourceTable)
    val dir = t.dir
    GraftDmlStatement(s"MERGE DELETE ${t.name()}", () => {
      val s = SparkSession.active
      val sourceKeys = GraftPlanBridge.ofRows(s, keysPlan).distinct()
      val latest = Export.latestSnapshotVersion(dir)
      require(latest > 0, s"nothing to merge into under $dir")
      val partCols = Export.snapshotPartitionColumns(dir, latest)
      val clusterKey =
        if (partCols.isEmpty)
          Export.snapshotProperties(dir).get("graft.cluster.key")
            .filter(keys.contains)
        else None
      if (partCols.nonEmpty && partCols.toSet.subsetOf(keys.toSet))
        Export.deleteSnapshotPartitioned(s, dir, sourceKeys, keys,
          partCols)
      else if (clusterKey.nonEmpty) {
        // unpartitioned but clustered on a merge key: a deleted row's
        // key EQUALS a source key, so files zone-disjoint from the
        // batch envelope cannot hold one — anti-join only the
        // overlapping files, carry the rest verbatim (a null-bearing
        // batch gets no provable envelope and degrades to the full
        // anti-join, never a silent miss)
        val ck = clusterKey.get
        val (n, env) = Export.batchEnvelope(sourceKeys.select(col(ck)),
          ck)
        if (n > 0)
          Export.rewriteSnapshotZoneScoped(s, dir, ck, env,
            meta = Map("deleted_envelope" ->
              env.map { case (lo, hi) => s"$lo:$hi" }.getOrElse("full")))(
            base => base.join(sourceKeys, keys, "left_anti"))
      } else {
        val remaining = Export.readSnapshot(s, dir, latest)
          .join(sourceKeys, keys, "left_anti")
        if (partCols.nonEmpty)
          Export.replaceSnapshotPartitioned(s, remaining, dir, partCols)
        else Export.replaceSnapshot(s, remaining, dir)
      }
      ()
    })
  }

  /** `WHEN NOT MATCHED THEN INSERT` (alone, unconditioned, key columns
    * assigned the ON clause's source columns): an anti-join append —
    * source keys already in the table are skipped, the rest INSERT.
    * O(batch) writes AND O(overlapping files) reads: the existing-keys
    * side is [[Export.snapshotKeysOverlapping]], planned from the
    * batch's key envelope against the manifest `s=`/`p=` tags — a
    * statted/clustered table pays only the files its batch could
    * collide with, never a full key scan. */
  private def rewriteMergeInsertOnly(m: MergeIntoTable, t: GraftLakeTable,
      keyConds: Seq[(AttributeReference, AttributeReference, Boolean)],
      refuse: String => Nothing): LogicalPlan = {
    val ia = (m.matchedActions, m.notMatchedActions,
        m.notMatchedBySourceActions) match {
      case (Seq(), Seq(InsertAction(None, ia)), Seq()) => ia
      case _ => miss()
    }
    val tOut = m.targetTable.outputSet
    val keys = keyConds.map(_._1.name)
    val ins = ia.map { a =>
      a.key match {
        case ar: AttributeReference => (ar: Attribute) -> a.value
        case _ => miss() // nested INSERT target: the general path
                         // refuses it loudly (no base row to rebuild)
      }
    }.toMap
    val projected = m.targetTable.output.map { ta =>
      val v = ins.getOrElse(ta, miss())
      if (v.references.exists(tOut.contains)) miss()
      keyConds.find(_._1.semanticEquals(ta)).foreach { case (_, sa, _) =>
        if (!v.semanticEquals(sa)) miss()
      }
      Alias(
        if (v.dataType == ta.dataType) v else Cast(v, ta.dataType),
        ta.name)()
    }
    val insPlan = Project(projected, m.sourceTable)
    val dir = t.dir
    GraftDmlStatement(s"MERGE INSERT ${t.name()}", () => {
      val s = SparkSession.active
      val src = GraftPlanBridge.ofRows(s, insPlan)
      val latest = Export.latestSnapshotVersion(dir)
      require(latest > 0, s"nothing to merge into under $dir")
      // envelope-pruned key scan + broadcast-friendly anti-join +
      // append-only commit — never a table rewrite
      val existing = Export.snapshotKeysOverlapping(s, dir, latest,
        keys, src.select(keys.map(col): _*))
      val fresh = src.join(existing, keys, "left_anti")
      val partCols = Export.snapshotPartitionColumns(dir, latest)
      if (partCols.nonEmpty)
        Export.appendSnapshotPartitioned(s, fresh, dir, partCols)
      else Export.appendSnapshot(s, fresh, dir)
      ()
    })
  }

  /** The canonical upsert — one unconditioned `UPDATE SET` + one
    * unconditioned `INSERT` assigning identical, source-only values
    * (what `SET * / INSERT *` expand to): routed to
    * [[Export.mergeSnapshotPartitioned]] when `layout ⊆ keys` (cost
    * follows the touched partitions), else [[Merge.upsert]] +
    * full-replace. Shapes that assign different or target-referencing
    * values fall through to the general rewrite instead. */
  private def rewriteMergeUpsert(m: MergeIntoTable, t: GraftLakeTable,
      keyConds: Seq[(AttributeReference, AttributeReference, Boolean)],
      refuse: String => Nothing): LogicalPlan = {
    val (updAssigns, insAssigns) = (m.matchedActions, m.notMatchedActions,
        m.notMatchedBySourceActions) match {
      case (Seq(UpdateAction(None, ua, _)), Seq(InsertAction(None, ia)),
          Seq()) => (ua, ia)
      case _ => miss()
    }
    val tOut = m.targetTable.outputSet
    val keys = keyConds.map(_._1.name)
    def byTarget(assigns: Seq[Assignment]): Map[Attribute, Expression] =
      assigns.map { a =>
        a.key match {
          case ar: AttributeReference => (ar: Attribute) -> a.value
          case _ => miss()
        }
      }.toMap
    val upd = byTarget(updAssigns)
    val ins = byTarget(insAssigns)
    // every target column assigned, UPDATE and INSERT agree
    // (Merge.upsert writes the same values on both paths), values are
    // source-only, and a key column takes the very source column the
    // ON clause joins on — otherwise the upsert's join key would
    // differ from the written key
    val projected = m.targetTable.output.map { ta =>
      val u = upd.getOrElse(ta, miss())
      val i = ins.getOrElse(ta, miss())
      if (!u.semanticEquals(i)) miss()
      if (u.references.exists(tOut.contains)) miss()
      keyConds.find(_._1.semanticEquals(ta)).foreach { case (_, sa, _) =>
        if (!u.semanticEquals(sa)) miss()
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
      val clusterKey =
        if (partCols.isEmpty)
          Export.snapshotProperties(dir).get("graft.cluster.key")
            .filter(keys.contains)
        else None
      if (partCols.nonEmpty && partCols.toSet.subsetOf(keys.toSet))
        Export.mergeSnapshotPartitioned(s, dir, updates, keys, partCols)
      else if (clusterKey.nonEmpty) {
        // unpartitioned but clustered on a merge key: rewrite only the
        // envelope-overlapping files (zone-disjoint files carry)
        val ck = clusterKey.get
        val (n, env) = Export.batchEnvelope(updates.select(col(ck)), ck)
        if (n > 0)
          Export.rewriteSnapshotZoneScoped(s, dir, ck, env)(base =>
            Merge.upsert(base, updates, keys))
      } else {
        val merged = Merge.upsert(
          Export.readSnapshot(s, dir, latest), updates, keys)
        if (partCols.nonEmpty)
          Export.replaceSnapshotPartitioned(s, merged, dir, partCols)
        else Export.replaceSnapshot(s, merged, dir)
      }
      ()
    })
  }

  /** The GENERAL merge — full SQL MERGE clause semantics in one
    * copy-on-write rewrite: per target row, matching source rows are
    * found by ONE outer join on the ON keys; the FIRST matched clause
    * whose condition holds fires (UPDATE's assignments or DELETE),
    * unfired rows carry; target rows with no match run the `NOT
    * MATCHED BY SOURCE` clauses the same way; source rows with no
    * match run the insert clauses, first-true inserting (unassigned
    * columns null-fill, the INSERT column-list law). Duplicate source
    * merge keys with matched clauses present raise the SQL cardinality
    * error (a target row may be modified at most once) — checked with
    * one tiny agg over the batch, not a join. A merge with ONLY insert
    * clauses commits as an APPEND against an envelope-pruned key scan
    * — no table rewrite. 100 TB shape: the rewrite is one shuffle on
    * the merge keys plus the partitioned/plain replace; conditions and
    * assignments stay codegen'd CASE expressions, and the source side
    * is broadcast when small (AQE). */
  private def rewriteMergeGeneral(m: MergeIntoTable, t: GraftLakeTable,
      keyConds: Seq[(AttributeReference, AttributeReference, Boolean)],
      refuse: String => Nothing): LogicalPlan = {
    val tOut = m.targetTable.outputSet
    val sOut = m.sourceTable.outputSet
    val targetNames = m.targetTable.output.map(_.name)
    // a fresh, collision-free namespace for the source side: every
    // source column is renamed positionally, so duplicate source names
    // and target/source clashes cannot mis-resolve
    val prefix = Iterator.from(0)
      .map(i => if (i == 0) "__mrg_" else s"__mrg${i}_")
      .find(p => !targetNames.exists(_.startsWith(p))).get
    val renameOf: Map[ExprId, String] = m.sourceTable.output.zipWithIndex
      .map { case (a, i) => a.exprId -> s"${prefix}s_$i" }.toMap
    val srcPlan = Project(m.sourceTable.output.map(a =>
      Alias(a, renameOf(a.exprId))()), m.sourceTable)

    def rebind(e: Expression): Expression = e.transform {
      case a: AttributeReference if sOut.contains(a) =>
        UnresolvedAttribute.quoted(renameOf(a.exprId))
      case a: AttributeReference if tOut.contains(a) =>
        UnresolvedAttribute.quoted(a.name)
    }
    def rebC(e: Expression): Column = GraftColumnBridge.column(rebind(e))

    def assignsOf(as: Seq[Assignment], what: String,
        sourceAllowed: Boolean): Map[String, Column] = {
      val triples = as.map { a =>
        targetPath(a.key) match {
          case Some((ar, p)) =>
            if (!sourceAllowed && a.value.references.exists(sOut.contains))
              refuse(s"$what assigns '${ar.name}' a source-referencing " +
                s"value (${a.value}) - no source row exists for a NOT " +
                "MATCHED BY SOURCE target row")
            // leaf-cast so the withField fold keeps the committed shape
            (ar.name, p, rebC(a.value).cast(Export.nullableType(a.key.dataType)))
          case None =>
            refuse(s"$what assigns an unsupported target ${a.key} - " +
              "top-level columns and struct-field paths only")
        }
      }
      triples.groupBy(_._1).map { case (root, items) =>
        root -> foldAssignments(root, col(root),
          items.map(i => (i._2, i._3)),
          msg => refuse(s"$what: $msg"))
      }
    }

    // clause capture: (condition, Some(assignments)=UPDATE / None=DELETE)
    val matchedActs: Seq[(Option[Column], Option[Map[String, Column]])] =
      m.matchedActions.map {
        case UpdateAction(c, as, _) =>
          (c.map(rebC), Some(assignsOf(as, "WHEN MATCHED UPDATE",
            sourceAllowed = true)))
        case DeleteAction(c) => (c.map(rebC), None)
        case other => refuse(s"unsupported WHEN MATCHED action $other")
      }
    val insertActs: Seq[(Option[Column], Map[String, Column])] =
      m.notMatchedActions.map {
        case InsertAction(c, as) =>
          c.foreach(cc => if (cc.references.exists(tOut.contains))
            refuse("a WHEN NOT MATCHED condition references target " +
              "columns - no target row exists for an unmatched source " +
              "row"))
          val sets = as.map { a =>
            a.key match {
              case ar: AttributeReference =>
                if (a.value.references.exists(tOut.contains))
                  refuse(s"INSERT assigns '${ar.name}' a target-" +
                    "referencing value - no target row exists for an " +
                    "unmatched source row")
                ar.name -> rebC(a.value)
              case other =>
                refuse(s"INSERT assigns a non-top-level target $other")
            }
          }.toMap
          (c.map(rebC), sets)
        case other => refuse(s"unsupported WHEN NOT MATCHED action $other")
      }
    val bySourceActs: Seq[(Option[Column], Option[Map[String, Column]])] =
      m.notMatchedBySourceActions.map {
        case UpdateAction(c, as, _) =>
          c.foreach(cc => if (cc.references.exists(sOut.contains))
            refuse("a WHEN NOT MATCHED BY SOURCE condition references " +
              "source columns"))
          (c.map(rebC), Some(assignsOf(as, "WHEN NOT MATCHED BY SOURCE " +
            "UPDATE", sourceAllowed = false)))
        case DeleteAction(c) =>
          c.foreach(cc => if (cc.references.exists(sOut.contains))
            refuse("a WHEN NOT MATCHED BY SOURCE condition references " +
              "source columns"))
          (c.map(rebC), None)
        case other =>
          refuse(s"unsupported WHEN NOT MATCHED BY SOURCE action $other")
      }

    val keys = keyConds.map(_._1.name)
    val keyCaptured: Seq[(String, String, Boolean)] = keyConds.map {
      case (ta, sa, ns) => (ta.name, renameOf(sa.exprId), ns) }
    val dir = t.dir
    val marker = s"${prefix}matched"
    val miCol = s"${prefix}mi"
    val biCol = s"${prefix}bi"
    val insCol = s"${prefix}ins"

    // first-true clause index (1-based; 0 = no clause fires); a NULL
    // condition is false, the SQL law
    def firstIdx(conds: Seq[Option[Column]]): Column =
      conds.zipWithIndex.foldLeft(Option.empty[Column]) {
        case (acc, (c, i)) =>
          val cond = c.getOrElse(lit(true))
          Some(acc.fold(when(cond, lit(i + 1)))(_.when(cond, lit(i + 1))))
      }.map(_.otherwise(lit(0))).getOrElse(lit(0))
    def notDeleted(idx: Column,
        acts: Seq[(Option[Column], Option[Map[String, Column]])]): Column = {
      val dels = acts.zipWithIndex.collect {
        case ((_, None), i) => i + 1 }
      if (dels.isEmpty) lit(true)
      else !idx.isin(dels.map(Integer.valueOf): _*)
    }

    GraftDmlStatement(s"MERGE INTO ${t.name()} (general)", () => {
      val s = SparkSession.active
      val latest = Export.latestSnapshotVersion(dir)
      require(latest > 0, s"nothing to merge into under $dir")
      val st = Export.snapshotSchema(dir, latest).getOrElse(
        throw new IllegalStateException(s"version $latest under $dir " +
          "has no #schema= header (pre-header legacy manifest) - " +
          "recommit"))
      val src = GraftPlanBridge.ofRows(s, srcPlan)
      val joinCond = keyCaptured.map { case (tn, sn, ns) =>
        if (ns) col(tn) <=> col(sn) else col(tn) === col(sn)
      }.reduce(_ && _)
      val partCols = Export.snapshotPartitionColumns(dir, latest)

      def insertRows(existing: DataFrame): DataFrame = {
        val notM = src.join(existing, joinCond, "left_anti")
        val withIdx = notM.withColumn(insCol,
          firstIdx(insertActs.map(_._1)))
        // a column the INSERT clause leaves unassigned takes its
        // declared DEFAULT (the SQL law — the committed schema carries
        // CURRENT_DEFAULT thanks to the metadata-carry law), else NULL;
        // generated columns stay NULL here and the epoch writer
        // computes them
        def unassigned(f: org.apache.spark.sql.types.StructField): Column =
          (if (f.metadata.contains("CURRENT_DEFAULT"))
            org.apache.spark.sql.functions
              .expr(f.metadata.getString("CURRENT_DEFAULT"))
          else lit(null)).cast(Export.nullableType(f.dataType))
        withIdx.filter(col(insCol) > 0).select(st.fields.toSeq.map {
          f =>
            insertActs.zipWithIndex.foldLeft(Option.empty[Column]) {
              case (acc, ((_, sets), k)) =>
                val v = sets.get(f.name)
                  .map(_.cast(Export.nullableType(f.dataType)))
                  .getOrElse(unassigned(f))
                Some(acc.fold(when(col(insCol) === (k + 1), v))(
                  _.when(col(insCol) === (k + 1), v)))
            }.map(_.otherwise(unassigned(f)))
              .getOrElse(unassigned(f))
              .as(f.name, f.metadata)
        }: _*)
      }

      if (matchedActs.isEmpty && bySourceActs.isEmpty) {
        // conditioned-insert-only: every target row carries — commit as
        // an APPEND against the envelope-pruned key scan, never a
        // rewrite (sound for plain-equality keys; a null-safe key can
        // match NULL incumbents the envelope cannot see, so it scans)
        val existing =
          if (keyCaptured.forall(!_._3))
            Export.snapshotKeysOverlapping(s, dir, latest, keys,
              src.select(keyCaptured.map { case (tn, sn, _) =>
                col(sn).as(tn) }: _*))
          else Export.readSnapshot(s, dir, latest)
            .select(keys.map(col): _*).distinct()
        val fresh = insertRows(existing)
        if (partCols.nonEmpty)
          Export.appendSnapshotPartitioned(s, fresh, dir, partCols)
        else Export.appendSnapshot(s, fresh, dir)
      } else {
        // SQL cardinality law: with matched clauses present, a
        // duplicate source merge key would update/delete one target
        // row twice — refuse BEFORE any write (one tiny agg over the
        // batch)
        if (matchedActs.nonEmpty) {
          val nonNull = keyCaptured.filterNot(_._3)
            .map { case (_, sn, _) => col(sn).isNotNull }
          val eligible = nonNull.foldLeft(src)((d, c) => d.filter(c))
          val dup = eligible
            .groupBy(keyCaptured.map { case (_, sn, _) => col(sn) }: _*)
            .count().filter(col("count") > 1).limit(1).count()
          require(dup == 0L,
            s"MERGE INTO $dir: the source has duplicate merge keys - " +
              "a matched target row would be updated/deleted more " +
              "than once (the SQL MERGE cardinality violation). " +
              "De-duplicate the source (e.g. keep the latest row per " +
              "key) first")
        }

        // first-true clause resolution against a base slice: ONE outer
        // join, per-clause CASE towers, inserts anti-joined — shared
        // by the full, partition-scoped and zone-scoped commits
        def resolveAgainst(base: DataFrame): DataFrame = {
          val joined = base.join(src.withColumn(marker, lit(true)),
            joinCond, "left_outer")
          val isM = coalesce(col(marker), lit(false))
          val tagged = joined
            .withColumn(miCol, firstIdx(matchedActs.map(_._1)))
            .withColumn(biCol, firstIdx(bySourceActs.map(_._1)))
          val kept = tagged.filter(
              when(isM, notDeleted(col(miCol), matchedActs))
                .otherwise(notDeleted(col(biCol), bySourceActs)))
            .select(st.fields.toSeq.map { f =>
              val cases: Seq[(Column, Column)] =
                matchedActs.zipWithIndex.collect {
                  case ((_, Some(sets)), i) if sets.contains(f.name) =>
                    (isM && col(miCol) === (i + 1)) ->
                      sets(f.name).cast(Export.nullableType(f.dataType))
                } ++
                bySourceActs.zipWithIndex.collect {
                  case ((_, Some(sets)), j) if sets.contains(f.name) =>
                    (!isM && col(biCol) === (j + 1)) ->
                      sets(f.name).cast(Export.nullableType(f.dataType))
                }
              cases.foldLeft(Option.empty[Column]) { case (acc, (c, v)) =>
                Some(acc.fold(when(c, v))(_.when(c, v)))
              }.map(_.otherwise(col(f.name))).getOrElse(col(f.name))
                .as(f.name, f.metadata)
            }: _*)
          if (insertActs.isEmpty) kept
          else kept.unionByName(insertRows(base))
        }

        // PARTITION-SCOPED general merge: with `layout ⊆ keys` and no
        // by-source clauses, every matched row lives in a partition
        // named by the source keys (a key pins its partition), so the
        // outer join, the clause resolution and the rewrite all run
        // over the TOUCHED partitions only — untouched partitions'
        // files carry verbatim, and an insert landing outside them
        // appends additively. By-source clauses break the scoping
        // (they fire on unmatched rows anywhere in the table).
        val scoped = partCols.nonEmpty && bySourceActs.isEmpty &&
          partCols.toSet.subsetOf(keys.toSet)
        if (scoped) {
          val tupleCols = partCols.map(pc =>
            keyCaptured.find(_._1 == pc).get._2)
          val touched: Set[Seq[String]] =
            src.select(tupleCols.map(c => col(c).cast("string")): _*)
              .distinct().collect()
              .map(r => partCols.indices.map(i => r.getString(i))
                : Seq[String]).toSet
          if (touched.nonEmpty) {
            val base = Export.readSnapshotPartitionTuples(s, dir,
              latest, partCols, touched)
            Export.replaceSnapshotPartitionsScoped(s,
              resolveAgainst(base), dir, partCols, touched,
              meta = Map(
                "merged_partitions" -> touched.size.toString))
          } // empty batch + no by-source clauses: nothing can change
        } else {
          // ZONE-SCOPED general merge: an unpartitioned table kept
          // CLUSTERED on a merge key (declared via the
          // `graft.cluster.key` table property) rewrites only the
          // files whose z= zone overlaps the batch's key envelope —
          // the conditioned-CDC answer where there is no layout. A
          // null-key batch gets no provable envelope and degrades to
          // the full rewrite (never silently misses an incumbent).
          val ckOpt =
            if (partCols.isEmpty && bySourceActs.isEmpty)
              Export.snapshotProperties(dir).get("graft.cluster.key")
                .filter(keys.contains)
            else None
          ckOpt match {
            case Some(ck) =>
              val sn = keyCaptured.find(_._1 == ck).get._2
              val (n, env) = Export.batchEnvelope(
                src.select(col(sn).as(ck)), ck)
              if (n > 0)
                Export.rewriteSnapshotZoneScoped(s, dir, ck, env,
                  meta = Map("merged_envelope" ->
                    env.map { case (lo, hi) => s"$lo:$hi" }
                      .getOrElse("full")))(resolveAgainst)
            case None =>
              val result = resolveAgainst(
                Export.readSnapshot(s, dir, latest))
              if (partCols.nonEmpty)
                Export.replaceSnapshotPartitioned(s, result, dir,
                  partCols)
              else Export.replaceSnapshot(s, result, dir)
          }
        }
      }
      ()
    })
  }
}
