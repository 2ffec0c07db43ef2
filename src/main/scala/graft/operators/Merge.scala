package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental-refresh primitives — the two operations every warehouse
  * pipeline re-implements on top of a batch engine:
  *
  *  - [[upsert]]: MERGE INTO semantics without a table format — updates
  *    win per key, inserts appear, unmatched base rows persist. One
  *    key-keyed shuffle per side (a plain full-outer equi-join), so at
  *    100 TB it costs what the join costs and nothing more; with both
  *    sides bucketed on the key (the `writeBucketed` layout) it compiles
  *    exchange-free.
  *
  *  - [[mergeAggregates]]: refresh a pre-aggregated table from a delta
  *    WITHOUT rescanning the base — union the partial-aggregate rows and
  *    re-reduce. Sound exactly when every aggregate column is
  *    associatively mergeable (counts and sums are; averages must travel
  *    as sum+count — the caller picks the decomposition, and the gate
  *    hash-match proves merged ≡ full recompute).
  */
object Merge {

  /** Upsert `updates` into `base` on `keyCols`: for matched keys every
    * column takes the update's value; unmatched updates insert; unmatched
    * base rows pass through. Schemas must align by name. Null-safe key
    * equality (`<=>`), so null keys match null keys instead of silently
    * duplicating. */
  def upsert(base: DataFrame, updates: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    val cols = base.columns.toSeq
    require(updates.columns.toSeq.sorted == cols.sorted,
      s"schema mismatch: base ${cols.sorted} vs updates " +
        s"${updates.columns.toSeq.sorted}")
    val cond = keyCols.map(k => col(s"b.$k") <=> col(s"u.$k"))
      .reduce(_ && _)
    // side selection keys off an explicit presence marker, NOT per-column
    // coalesce: MERGE semantics say a matched row takes the update's value
    // in EVERY column, including a legitimate NULL that a coalesce would
    // silently paper over with the base's stale value. The marker name is
    // derived to be absent from the schema — a user column literally
    // named "_m" must survive, not be overwritten by the marker.
    val m = graft.operators.Export.freshName("_m", cols)
    base.as("b").join(updates.withColumn(m, lit(true)).as("u"),
        cond, "full_outer")
      .select(cols.map(c =>
        when(col(s"u.$m"), col(s"u.$c")).otherwise(col(s"b.$c")).as(c)): _*)
  }

  /** ORDER-RESOLVED upsert — the out-of-order CDC apply law: per key,
    * the surviving row is the MAXIMUM by `orderCols` (then by every
    * remaining column, so the resolution is a total order and therefore
    * deterministic) across base ∪ updates. Unlike [[upsert]] (updates
    * win unconditionally), this is ASSOCIATIVE and COMMUTATIVE in the
    * update batches: applying micro-batches one at a time, in ANY
    * arrival order, settles to exactly the global resolution — the
    * property a CDC consumer needs when its feed is not ordered (late
    * replicas, replayed partitions). One hash shuffle on the key.
    *
    * Null caveat: Spark ranks NULL lowest in struct comparison, so a
    * NULL order field loses to any non-null one (the sane CDC default:
    * a record without a sequence number never beats one with). */
  def upsertLatest(base: DataFrame, updates: DataFrame,
      keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "upsertLatest needs at least one key column")
    require(orderCols.nonEmpty, "upsertLatest needs an ordering column")
    val cols = base.columns.toSeq
    require(updates.columns.toSeq.sorted == cols.sorted,
      s"schema mismatch: base ${cols.sorted} vs updates " +
        s"${updates.columns.toSeq.sorted}")
    require(orderCols.forall(cols.contains), s"unknown order column in " +
      s"${orderCols.mkString(", ")}")
    require(orderCols.intersect(keyCols).isEmpty,
      "order columns must not be key columns (constant per key)")
    val payload = cols.filterNot(keyCols.contains)
    val ordered = orderCols ++ payload.filterNot(orderCols.contains)
    val m = graft.operators.Export.freshName("_m", cols)
    base.unionByName(updates)
      .groupBy(keyCols.map(col): _*)
      .agg(max(struct(ordered.map(col): _*)).as(m))
      .select(cols.map(c =>
        if (keyCols.contains(c)) col(c) else col(s"$m.$c").as(c)): _*)
  }

  /** Merge partial-aggregate tables (same schema: `groupCols` +
    * associatively-mergeable measure columns, each tagged with its merge
    * op): re-group and reduce. `sums` columns merge by SUM, `mins` by
    * MIN, `maxs` by MAX. */
  def mergeAggregates(partials: Seq[DataFrame], groupCols: Seq[String],
      sums: Seq[String], mins: Seq[String] = Nil,
      maxs: Seq[String] = Nil): DataFrame = {
    require(partials.nonEmpty, "nothing to merge")
    val unioned = partials.reduce(_.unionByName(_))
    val aggs = sums.map(c => sum(col(c)).as(c)) ++
      mins.map(c => min(col(c)).as(c)) ++
      maxs.map(c => max(col(c)).as(c))
    require(aggs.nonEmpty, "no measure columns")
    unioned.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
