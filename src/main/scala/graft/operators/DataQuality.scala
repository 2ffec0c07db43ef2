package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ/dbt-tests shape):
  * a set of named checks over a table compiles into ONE conditional-
  * aggregate pass — every row-local constraint becomes an `avg(when(...))`
  * column in a single `agg()`, so a 50-check suite over 100 TB still
  * costs one scan and one 1-row aggregate. Referential checks (the only
  * cross-table kind) each add one anti-join keyed on the reference — the
  * same equi-join shape every other operator here shuffles on.
  *
  * Output: one row per check — `(check, metric, passed)` where `metric`
  * is the satisfied fraction (or ratio, for uniqueness) rounded to 9 and
  * `passed` applies the check's minimum-fraction threshold. Engine-
  * portable: fractions are exact integer-count divisions, so the verify
  * gate hash-matches a DuckDB replay of the same SQL semantics.
  */
object DataQuality {

  sealed trait Check {
    def name: String
    def minFraction: Double
  }

  /** Fraction of rows where `col` is not null. */
  final case class Complete(name: String, column: Column,
      minFraction: Double = 1.0) extends Check

  /** Fraction of rows satisfying an arbitrary row-local predicate. */
  final case class Satisfies(name: String, predicate: Column,
      minFraction: Double = 1.0) extends Check

  /** Distinct-to-total ratio of `col` (1.0 = unique key). */
  final case class Unique(name: String, column: Column,
      minFraction: Double = 1.0) extends Check

  /** Fraction of rows whose `key` exists in `ref`'s `refKey` (nulls count
    * as failures — a null FK can't resolve). */
  final case class RefIntegrity(name: String, key: Column, ref: DataFrame,
      refKey: Column, minFraction: Double = 1.0) extends Check

  /** Run the suite: one conditional-aggregate pass for all row-local
    * checks (+ uniqueness distincts in the same agg), one anti-join per
    * referential check. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    val spark = df.sparkSession
    val local = checks.collect {
      case c: Complete => (c.name,
        avg(when(c.column.isNotNull, 1.0).otherwise(0.0)))
      case c: Satisfies => (c.name,
        avg(when(c.predicate, 1.0).otherwise(0.0)))
      case c: Unique => (c.name,
        count_distinct(c.column).cast("double") / count(lit(1)))
    }
    val localDf: Option[DataFrame] = if (local.isEmpty) None else Some {
      // positional aliases: check names are dotted (table.col.kind) and a
      // dotted name inside col() would parse as struct access
      val aggs = local.zipWithIndex.map { case ((_, e), i) => e.as(s"m_$i") }
      val row = df.agg(aggs.head, aggs.tail: _*)
      row.select(array(local.zipWithIndex.map { case ((n, _), i) =>
          struct(lit(n).as("check"), col(s"m_$i").as("metric"))
        }: _*).as("a"))
        .select(explode(col("a")).as("s"))
        .select(col("s.check"), col("s.metric"))
    }
    val refs = checks.collect { case c: RefIntegrity =>
      val total = df.count()
      val resolved =
        if (total == 0) 0L
        else df.select(c.key.as("_k")).filter(col("_k").isNotNull)
          .join(c.ref.select(c.refKey.as("_k")).distinct(), Seq("_k"),
            "left_semi")
          .count()
      val metric = if (total == 0) 1.0 else resolved.toDouble / total
      import spark.implicits._
      Seq((c.name, metric)).toDF("check", "metric")
    }
    val all = (localDf.toSeq ++ refs).reduce(_.unionByName(_))
    val thresholds = checks.map(c => (c.name, c.minFraction))
    import spark.implicits._
    val tDf = broadcast(thresholds.toDF("check", "min_fraction"))
    // pass/fail gates on the UNROUNDED metric: rounding first would let a
    // table with up to ~5e-10 violating fraction — hundreds of bad rows
    // at billions-of-rows scale — round up to 1.0 and "pass" an exactness
    // (minFraction = 1.0) constraint. round(·, 9) survives only on the
    // displayed metric column.
    all.join(tDf, "check")
      .select(col("check"), round(col("metric"), 9).as("metric"),
        (col("metric") >= col("min_fraction")).cast("int")
          .as("passed"))
  }
}
