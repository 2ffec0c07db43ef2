package graft.sources

import org.apache.spark.sql.types._

/** MySQL `CREATE TABLE` DDL → Spark `StructType` + per-column metadata.
  *
  * The reference replays schema files against an embedded TiDB parser and
  * reloads `model.TableInfo` over HTTP (reference: lightning/restore/
  * tidb.go:85-208). A Spark-native engine needs none of that machinery —
  * just the declared shape: Spark type, nullability, default value,
  * AUTO_INCREMENT flag, primary key. This is a pragmatic recursive-descent
  * reader of the mydumper-emitted DDL dialect (type mapping per SURVEY §1.2).
  *
  * Schema is fixed and user-declared — never inferred (reference:
  * lightning/mydump/loader.go:65: `no-schema` aside, every table has a
  * `*-schema.sql`).
  */
final case class MysqlColumn(
    name: String,
    sparkType: DataType,
    nullable: Boolean,
    default: Option[String],     // raw default literal (None = no default)
    autoIncrement: Boolean,
    unsigned: Boolean,
    rawType: String,
    // ENUM/SET member domain (SURVEY §1.2: StringType + domain check);
    // None for every other type
    enumValues: Option[Seq[String]] = None) {
  def isSet: Boolean = rawType.trim.toLowerCase.startsWith("set")
}

final case class MysqlTable(
    name: String,
    columns: Seq[MysqlColumn],
    primaryKey: Seq[String],
    // declared UNIQUE keys (column lists) — REPLACE/IGNORE replay is only
    // idempotent when the target has a PRIMARY or UNIQUE key to collide on
    uniqueKeys: Seq[Seq[String]] = Nil,
    // table-level AUTO_INCREMENT=N option (tests/tidb_rowid pre_rebase:
    // `create table t (...) auto_increment=70000` — the post-import rebase
    // must start allocations at N even when the imported ids are all
    // below it; reference lightning/restore/tidb.go:241-257)
    autoIncrementStart: Option[Long] = None) {
  def schema: StructType =
    StructType(columns.map(c => StructField(c.name, c.sparkType, c.nullable)))
  def column(n: String): Option[MysqlColumn] =
    columns.find(_.name.equalsIgnoreCase(n))
  /** True when REPLACE/IGNORE statements can actually deduplicate replays. */
  def hasReplayKey: Boolean = primaryKey.nonEmpty || uniqueKeys.nonEmpty
}

object MysqlDdl {

  /** Map a MySQL type spec (already lowercased, e.g. "bigint(20) unsigned")
    * to a Spark type per SURVEY §1.2. */
  def mapType(raw: String): DataType = {
    val t = raw.trim.toLowerCase
    val base = t.takeWhile(c => c.isLetter)
    val args: Seq[Int] = {
      val i = t.indexOf('(')
      if (i < 0) Nil
      else t.substring(i + 1, t.indexOf(')', i) max (i + 1))
        .split(',').toSeq.map(_.trim).filter(_.forall(_.isDigit))
        .flatMap(s => if (s.isEmpty) None else Some(s.toInt))
    }
    val unsigned = t.contains("unsigned")
    base match {
      case "tinyint"   => if (unsigned) ShortType else ByteType
      case "smallint"  => if (unsigned) IntegerType else ShortType
      case "mediumint" => IntegerType
      case "int" | "integer" => if (unsigned) LongType else IntegerType
      case "bigint"    => if (unsigned) DecimalType(20, 0) else LongType
      case "decimal" | "numeric" =>
        DecimalType(args.headOption.getOrElse(10), args.lift(1).getOrElse(0))
      case "float"     => FloatType
      case "double" | "real" => DoubleType
      case "bit"       => if (args.headOption.getOrElse(1) <= 64) LongType else BinaryType
      case "char" | "varchar" | "tinytext" | "text" | "mediumtext" | "longtext" =>
        StringType
      case "binary" | "varbinary" | "tinyblob" | "blob" | "mediumblob" | "longblob" =>
        BinaryType
      case "date"      => DateType
      case "datetime"  => TimestampNTZType
      case "timestamp" => TimestampType
      case "time"      => StringType // no native duration; validated textually
      case "year"      => ShortType
      case "enum" | "set" => StringType // domain check applied post-cast
      case "json"      => StringType
      case _           => StringType
    }
  }

  /** K5: re-render a parsed MySQL table as Spark SQL DDL over the written
    * parquet location (`CREATE TABLE IF NOT EXISTS` with normalized name —
    * the role of the reference's createTableIfNotExistsStmt,
    * lightning/restore/tidb.go:85-152). */
  def toSparkDdl(db: String, table: MysqlTable, location: String): String = {
    val cols = (table.columns.map(c =>
      s"  `${c.name}` ${c.sparkType.sql}${if (c.nullable) "" else " NOT NULL"}") :+
      "  `_row_id` BIGINT NOT NULL").mkString(",\n")
    s"""CREATE TABLE IF NOT EXISTS `$db`.`${table.name}` (
       |$cols
       |) USING parquet LOCATION '$location'""".stripMargin
  }

  /** ENUM('a','b') / SET('x','y') member list (doubled-quote unescape);
    * None for non-enum types. */
  def enumMembers(typeSpec: String): Option[Seq[String]] = {
    val t = typeSpec.trim
    val base = t.toLowerCase.takeWhile(_.isLetter)
    if (base != "enum" && base != "set") None
    else {
      val i = t.indexOf('('); val j = t.lastIndexOf(')')
      if (i < 0 || j <= i) None
      else Some("""'((?:[^']|'')*)'""".r.findAllMatchIn(t.substring(i + 1, j))
        .map(_.group(1).replace("''", "'")).toSeq)
    }
  }

  // names may be backticked (mydumper style) or bare (hand-written DDL in
  // the reference's own fixtures, e.g. tests/tool_135: `create table
  // bar1(a int auto_increment primary key)`) — keyword-led lines (KEY,
  // UNIQUE, …) are filtered before this pattern is tried
  private val ColLine =
    """^\s*(?:`([^`]+)`|([a-zA-Z_][a-zA-Z0-9_$]*))\s+([a-zA-Z]+(?:\([^)]*\))?(?:\s+(?i:unsigned))?(?:\s+(?i:zerofill))?)(.*)$""".r
  private val PkLine = """(?i)^\s*PRIMARY\s+KEY\s*\(([^)]*)\).*$""".r
  private val UniqueLine =
    """(?i)^\s*UNIQUE(?:\s+KEY|\s+INDEX)?(?:\s+`[^`]+`|\s+[a-zA-Z0-9_]+)?\s*\((.*)\).*$""".r

  private val IndexKeywords = Set("UNIQUE", "KEY", "INDEX", "CONSTRAINT",
    "FOREIGN", "FULLTEXT", "SPATIAL", "PRIMARY", "CHECK")

  /** The full first identifier-ish word of a body line, uppercased —
    * "PRIMARY KEY (a)" → "PRIMARY", but "primary_contact int" →
    * "PRIMARY_CONTACT" (underscores keep the word going). */
  private def leadingWord(l: String): String =
    l.takeWhile(c => c.isLetterOrDigit || c == '_' || c == '$').toUpperCase

  /** Parse one CREATE TABLE statement. Comment stripping mirrors the
    * reference's schema reader (lightning/mydump/reader.go:67-114). */
  def parseCreateTable(ddl: String): MysqlTable = {
    val noComments = ddl.linesIterator
      .map(l => l.replaceAll("--.*$", ""))
      .filterNot(_.trim.isEmpty)
      .mkString("\n")
      .replaceAll("(?s)/\\*.*?\\*/", "")
    val nameR = """(?is)CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?[`"]?([^`"\s(]+)[`"]?""".r
    val tableName = nameR.findFirstMatchIn(noComments)
      .map(_.group(1)).getOrElse(sys.error(s"not a CREATE TABLE: ${ddl.take(80)}"))
    val (body, tableOptions) = {
      // the MATCHING close paren of the first open — lastIndexOf would
      // swallow trailing table options like `partition by hash(a)
      // partitions 5` (tests/partitioned-table), which are layout hints
      // for the target, not part of the column list
      val start = noComments.indexOf('(')
      require(start >= 0, s"malformed DDL for $tableName")
      var depth = 0; var i = start; var end = -1
      var inS = false; var q = ' '
      while (i < noComments.length && end < 0) {
        val ch = noComments.charAt(i)
        if (inS) {
          // MySQL string literals use backslash escapes by default — a
          // default like 'it\'s )' must not end the string (or the body)
          if (ch == '\\') i += 1
          else if (ch == q) inS = false
        } else ch match {
          case '\'' | '"' => inS = true; q = ch
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) end = i
          case _ =>
        }
        i += 1
      }
      require(end > start, s"malformed DDL for $tableName")
      (noComments.substring(start + 1, end), noComments.substring(end + 1))
    }
    // MySQL grammar makes the '=' in table options optional
    // (`AUTO_INCREMENT 70000` is valid DDL); unsigned 64-bit values above
    // Long.MaxValue clamp rather than throw in the parser.
    val autoIncStart = """(?i)AUTO_INCREMENT(?:\s*=\s*|\s+)(\d+)""".r
      .findFirstMatchIn(tableOptions).map { m =>
        val v = BigInt(m.group(1))
        if (v > Long.MaxValue) Long.MaxValue else v.toLong
      }
    // split body on top-level commas (respect parens + quoted strings)
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inStr = false; var quote = ' '; var esc = false
    val cur = new StringBuilder
    body.foreach { ch =>
      if (inStr) {
        cur += ch
        if (esc) esc = false
        else if (ch == '\\') esc = true
        else if (ch == quote) inStr = false
      } else ch match {
        case '\'' | '"' => inStr = true; quote = ch; cur += ch
        case '(' => depth += 1; cur += ch
        case ')' => depth -= 1; cur += ch
        case ',' if depth == 0 => parts += cur.toString; cur.clear()
        case _ => cur += ch
      }
    }
    if (cur.nonEmpty) parts += cur.toString

    var pk = Seq.empty[String]
    val uniq = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val cols = parts.toSeq.flatMap { p =>
      p.trim match {
        case PkLine(keys) =>
          pk = keys.split(',').toSeq.map(_.trim.stripPrefix("`").stripSuffix("`"))
          None
        case UniqueLine(keys) =>
          // strip quoting and index prefix lengths: `col`(10) -> col
          uniq += keys.split(',').toSeq.map(
            _.trim.takeWhile(_ != '(').trim.stripPrefix("`").stripSuffix("`"))
          None
        // with bare identifiers allowed below, index-kind keywords would
        // otherwise parse as phantom columns (`FULLTEXT KEY ft (body)` →
        // column "FULLTEXT"). Matched on the WHOLE leading word, never a
        // prefix — a bare column named `checksum` or `primary_contact` is
        // a column, not a CHECK/PRIMARY clause.
        case l if IndexKeywords(leadingWord(l)) => None
        case ColLine(quoted, bare, typeSpec, rest) =>
          val name = Option(quoted).getOrElse(bare)
          val restU = rest.toUpperCase
          val notNull = restU.contains("NOT NULL")
          val autoInc = restU.contains("AUTO_INCREMENT")
          val default = {
            // quoted alternative admits doubled '' quotes AND backslash
            // escapes — 'a''b\\c' is one literal, not 'a' + junk
            val m = """(?i)DEFAULT\s+('(?:''|\\.|[^'\\])*'|[^\s,]+)""".r.findFirstMatchIn(rest)
            m.map(_.group(1))
          }
          if (restU.contains("PRIMARY KEY") && pk.isEmpty) pk = Seq(name)
          Some(MysqlColumn(name, mapType(typeSpec), nullable = !notNull,
            default = default, autoIncrement = autoInc,
            unsigned = typeSpec.toLowerCase.contains("unsigned"),
            rawType = typeSpec.trim,
            enumValues = enumMembers(typeSpec)))
        case _ => None
      }
    }
    MysqlTable(tableName, cols, pk, uniq.toSeq, autoIncStart)
  }
}
