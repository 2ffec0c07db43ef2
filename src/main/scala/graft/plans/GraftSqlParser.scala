package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedLeafNode
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.trees.TreePattern
import org.apache.spark.sql.types.{DataType, StructType}

/** `DESCRIBE HISTORY <table|'path'>` / `DESCRIBE DETAIL <table|'path'>`
  * — the Delta-shaped operational statements. Spark's grammar has no
  * rule for them (Delta ships its own parser extension for exactly
  * this), so a thin DELEGATING parser claims these two shapes — one
  * compiled-regex probe per statement; everything else, including
  * every `DESCRIBE [TABLE]` form, passes through verbatim — and
  * resolution happens in [[RewriteGraftLakeDdl]], which rewrites the
  * carrier node to the same MANIFEST-ONLY plans as the
  * `graft_history` / `graft_detail` TVFs (by-name parity is
  * spec-pinned). Note `DESCRIBE history` (a table named history)
  * still reaches Spark: the probe requires a target after the
  * keyword. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val Desc =
    """(?is)^\s*DESC(?:RIBE)?\s+(HISTORY|DETAIL)\s+(.+?)\s*;?\s*$""".r
  private val SQuoted = """^'([^']+)'$""".r
  private val DQuoted = """^"([^"]+)"$""".r
  private val Opt = """(?is)^\s*OPTIMIZE\s+(.+?)\s*;?\s*$""".r
  private val Vac = """(?is)^\s*VACUUM\s+(.+?)\s*;?\s*$""".r
  private val Rst =
    ("""(?is)^\s*RESTORE\s+(?:TABLE\s+)?(.+?)\s+TO\s+""" +
      """(VERSION|TIMESTAMP)\s+AS\s+OF\s+(.+?)\s*;?\s*$""").r
  // claims the two lake-backfillable shapes ONLY: NOSCAN / FOR ALL
  // COLUMNS / DELTA etc. fall through to Spark's own grammar, and a
  // non-lake target falls back at resolution (the DESCRIBE pattern)
  private val Anl =
    ("""(?is)^\s*ANALYZE\s+TABLE\s+(.+?)\s+COMPUTE\s+STATISTICS""" +
      """(?:\s+FOR\s+COLUMNS\s+(.+?))?\s*;?\s*$""").r
  private val ZTail = """(?is)^(.*?)\s+ZORDER\s+BY\s+(.+)$""".r
  private val GTail =
    """(?is)^(.*?)\s+RETAG(?:\s+BY\s+\((.+?)\))?\s*$""".r
  private val WTail = """(?is)^(.*?)\s+WHERE\s+(.+)$""".r
  private val RTail =
    """(?is)^(.*?)\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS\s*$""".r
  private val DTail = """(?is)^(.*?)\s+DRY\s+RUN\s*$""".r

  private def target(t: String): (Seq[String], Option[String]) =
    t.trim match {
      case SQuoted(p) => (Nil, Some(p))
      case DQuoted(p) => (Nil, Some(p))
      case x => (delegate.parseMultipartIdentifier(x), None)
    }

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Desc(kind, t) =>
      val (parts, path) = target(t)
      GraftDescribeStatement(kind.toUpperCase, parts, path, sqlText)
    // `OPTIMIZE t [WHERE <pred>] [ZORDER BY (a[, b])]` — what an
    // operator actually types (the graft_optimize procedure's
    // statement face). Spark's grammar has no OPTIMIZE rule, so the
    // probe can never shadow a legal statement.
    case Opt(rest0) if GTail.unapplySeq(rest0).isDefined =>
      // `OPTIMIZE t RETAG [BY (a[, b])]` — partition-tag backfill:
      // re-stamp `p=` specs on untagged epochs (metadata-only for
      // single-tuple files, a scoped rewrite for spanning ones) so a
      // legacy epoch stops disabling DPP surfacing
      val GTail(tTxt, colsTxt) = rest0: @unchecked
      val (parts, path) = target(tTxt)
      GraftMaintenanceStatement("RETAG", parts, path, None,
        Option(colsTxt).map(_.split(',')
            .map(_.trim.stripPrefix("`").stripSuffix("`"))
            .filter(_.nonEmpty).toSeq)
          .getOrElse(Seq.empty[String]),
        None, sqlText)
    case Opt(rest0) =>
      val (rest1, zcols) = rest0 match {
        case ZTail(head, cols) => (head,
          cols.trim.stripPrefix("(").stripSuffix(")").split(',')
            .map(_.trim.stripPrefix("`").stripSuffix("`"))
            .filter(_.nonEmpty).toSeq)
        case _ => (rest0, Seq.empty[String])
      }
      val (tTxt, whereSql) = rest1 match {
        case WTail(head, w) => (head, Some(w.trim))
        case _ => (rest1, None)
      }
      val (parts, path) = target(tTxt)
      GraftMaintenanceStatement("OPTIMIZE", parts, path, whereSql,
        zcols, None, sqlText)
    // `VACUUM t [RETAIN n HOURS] [DRY RUN]` — the retention
    // statement; DRY RUN reports what a real run would reclaim and
    // touches nothing (the pre-flight every retention change deserves)
    case Vac(rest0) =>
      val (rest1, dry) = rest0 match {
        case DTail(head) => (head, true)
        case _ => (rest0, false)
      }
      val (tTxt, retain) = rest1 match {
        case RTail(head, n) => (head, Some(n.toDouble))
        case _ => (rest1, None)
      }
      val (parts, path) = target(tTxt)
      GraftMaintenanceStatement("VACUUM", parts, path, None, Nil,
        retain, sqlText, dryRun = dry)
    // `RESTORE [TABLE] t TO VERSION|TIMESTAMP AS OF v` — the rollback
    // statement (graft_restore's statement face)
    case Rst(tTxt, verb, value) =>
      val (parts, path) = target(tTxt)
      GraftMaintenanceStatement("RESTORE", parts, path, None, Nil,
        None, sqlText,
        asOf = Some((verb.toUpperCase(java.util.Locale.ROOT),
          value.trim)))
    // `ANALYZE TABLE t COMPUTE STATISTICS [FOR COLUMNS a, b]` — the
    // stats-backfill statement on lake tables (one read pass, zero
    // rewrites, metadata-only commit); the column list rides the
    // zorderCols slot. A target that is NOT a bare identifier/path
    // (`ANALYZE TABLE t PARTITION (ds=...) COMPUTE STATISTICS` —
    // Spark's own partition form) falls through to Spark's grammar
    // verbatim: the probe must never break a previously valid
    // statement.
    case Anl(tTxt, colsTxt) =>
      (try Some(target(tTxt))
        catch { case scala.util.control.NonFatal(_) => None }) match {
        case Some((parts, path)) =>
          GraftMaintenanceStatement("ANALYZE", parts, path, None,
            Option(colsTxt).map(_.split(',')
                .map(_.trim.stripPrefix("`").stripSuffix("`"))
                .filter(_.nonEmpty).toSeq)
              .getOrElse(Seq.empty[String]),
            None, sqlText)
        case None => delegate.parsePlan(sqlText)
      }
    case _ => delegate.parsePlan(sqlText)
  }

  // the interface DEFAULT drops the parameter context on the floor
  // (it calls bare parsePlan) — parameterized spark.sql(sql, args)
  // must reach the delegate's real implementation
  override def parsePlanWithParameters(sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext)
      : LogicalPlan = sqlText match {
    case Desc(_, _) | Opt(_) | Vac(_) | Rst(_, _, _) | Anl(_, _) =>
      parsePlan(sqlText) // these take no parameters
    case _ => delegate.parsePlanWithParameters(sqlText, ctx)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(
      sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

/** Unresolved `DESCRIBE HISTORY/DETAIL` carrier (kind is "HISTORY" or
  * "DETAIL"; exactly one of nameParts/path is set), claimed at the
  * hint seam by [[RewriteGraftLakeDdl]]. Carries the COMMAND pattern
  * so the rule's pruning guard visits it. `original` is the verbatim
  * statement text: when the target is NOT a lake table and a real
  * table/view named `history`/`detail` exists, the statement was
  * Spark's column-describe form (`DESCRIBE history doc_id`) that the
  * probe regex cannot distinguish — the rule re-parses the original
  * with Spark's own parser instead of failing. */
final case class GraftDescribeStatement(kind: String,
    nameParts: Seq[String], path: Option[String],
    original: String = "")
    extends UnresolvedLeafNode {
  final override val nodePatterns: Seq[TreePattern.TreePattern] =
    Seq(TreePattern.COMMAND)
}

/** Unresolved `OPTIMIZE` / `VACUUM` / `RESTORE` carrier (kind is
  * "OPTIMIZE", "VACUUM" or "RESTORE"; `asOf` carries RESTORE's
  * (VERSION|TIMESTAMP, value)), claimed by [[RewriteGraftLakeDdl]],
  * which resolves the
  * target like the DESCRIBE statements and defers the maintenance
  * commit to execution — `spark.sql` runs it eagerly (Command), and
  * the result row mirrors the procedure twin (`graft_optimize` →
  * (version, n_files); `graft_vacuum` → (dropped_versions,
  * deleted_files)): by-name parity is spec-pinned. */
final case class GraftMaintenanceStatement(kind: String,
    nameParts: Seq[String], path: Option[String],
    whereSql: Option[String], zorderCols: Seq[String],
    retainHours: Option[Double], original: String,
    asOf: Option[(String, String)] = None,
    dryRun: Boolean = false)
    extends UnresolvedLeafNode {
  final override val nodePatterns: Seq[TreePattern.TreePattern] =
    Seq(TreePattern.COMMAND)
}
