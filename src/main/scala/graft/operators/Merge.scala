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
