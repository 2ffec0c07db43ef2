package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as primitives, built from the shapes that
  * survive 100 TB — one key-partitioned shuffle each, never a nested-loop
  * pair scan.
  *
  * Beyond-reference operators (the reference engine has no temporal join
  * surface at all); both are staples of event-log curation pipelines.
  */
object TemporalJoin {

  /** Backward, inclusive as-of join: for every left row (key, tLeft),
    * attach the payload of the LATEST right row (key, tRight ≤ tLeft),
    * null when none (or none within `toleranceUs`).
    *
    * Shape: tag both sides, UNION, one window over (key) ordered by
    * (time, side, tie) carrying `last(payload, ignoreNulls)` — a single
    * hash-partitioned shuffle on the key and a per-partition sort. The
    * naive formulations are quadratic (theta-join on `tRight <= tLeft` →
    * BroadcastNestedLoopJoin) or re-shuffle per aggregation (max-per-left
    * + join-back); the union-window form is the one that scales linearly
    * with rows per key. Ties (equal time, several right rows): the
    * largest `tieCol` wins — deterministic under retries.
    *
    * Right columns arrive prefixed `asof_` (payloads + `asof_<tieCol>`,
    * `asof_<rightTime>`). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, tieCol: String,
      payloadCols: Seq[String] = Nil,
      toleranceUs: Option[Long] = None): DataFrame = {
    val payload = (Seq(rightTime, tieCol) ++ payloadCols).distinct
    val leftCols = left.columns.toSeq
    // aligned union schema: left cols ++ asof_* payload cols ++ markers
    val lAligned = left.select(
      leftCols.map(col) ++
        payload.map(p => lit(null).cast(
          right.schema(p).dataType).as(s"asof_$p")) ++
        Seq(col(leftTime).cast("long").as("__t"), lit(1).as("__side"),
          lit(Long.MaxValue).as("__tie")): _*)
    val rAligned = right.select(
      leftCols.map(c => if (c == key) col(key)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(p => col(p).as(s"asof_$p")) ++
        Seq(col(rightTime).cast("long").as("__t"), lit(0).as("__side"),
          col(tieCol).cast("long").as("__tie")): _*)
    // at equal time the right row must sort BEFORE the left row
    // (inclusive as-of); among equal-time right rows the largest tie wins
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedT = last(when(col("__side") === 0, col("__t")), ignoreNulls = true)
      .over(w)
    val withMatch = lAligned.unionByName(rAligned)
      .select((leftCols.map(col) :+ col("__t") :+ col("__side") :+
        matchedT.as("__mt")) ++
        payload.map(p => last(when(col("__side") === 0, col(s"asof_$p")),
          ignoreNulls = true).over(w).as(s"asof_$p")): _*)
      .filter(col("__side") === 1)
    val inTol = toleranceUs match {
      case Some(tol) => col("__mt").isNotNull && col("__mt") >= col("__t") - tol
      case None => col("__mt").isNotNull
    }
    withMatch.select(leftCols.map(col) ++
      payload.map(p => when(inTol, col(s"asof_$p")).as(s"asof_$p")): _*)
  }

  /** Point-in-interval range join: every (point row, interval row) pair
    * with the same `key` and `startCol <= pointCol <= endCol`.
    *
    * Shape: intervals explode to one row per `bucketUs`-wide time bucket
    * they overlap, points hash to their single bucket, and the join is an
    * EQUI-join on (key, bucket) + a residual containment filter — each
    * qualifying pair meets in exactly one bucket (the point's), so no
    * dedup pass is needed. A plain `BETWEEN` condition would plan as a
    * nested-loop join; this is the linear-ish banded form (same idea as
    * the LSH band joins). Size `bucketUs` near the typical interval
    * length: spans cost ~(len/bucketUs + 1) exploded rows each.
    * Degenerate intervals (end < start) match nothing and are dropped. */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
      pointCol: String, startCol: String, endCol: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive: $bucketUs")
    val p = points.withColumn("__bucket",
      floor(col(pointCol).cast("long") / bucketUs))
    val iv = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("__bucket", explode(sequence(
        floor(col(startCol).cast("long") / bucketUs),
        floor(col(endCol).cast("long") / bucketUs))))
      .withColumnRenamed(key, s"__ikey")
    p.join(iv, col(key) === col("__ikey") &&
        p("__bucket") === iv("__bucket") &&
        col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket", "__ikey")
  }
}
