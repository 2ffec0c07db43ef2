package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `string_map_lookup(string) -> bigint?` — one hash probe into a
  * driver-built table, null on miss.
  *
  * Replaces the literal `map(...)` lookup RowIdAllocator used for per-file
  * row-id bases. A Catalyst literal map has two scale problems there:
  * `GetMapValue` does a LINEAR key scan per row (O(#entries) string
  * compares), and every entry is a node in the plan tree (a 100 TB table's
  * ~400k shards × 5 path renderings would be a ~2M-entry `map()` literal —
  * plan-size/codegen blowup before any task runs). It also throws under
  * ANSI on a missing key, which broke the miss→fallback chain this
  * expression exists to serve.
  *
  * Here the table is ONE reference object (`ctx.addReferenceObj`) regardless
  * of entry count, the probe is a single `java.util.HashMap.get`, and a miss
  * yields SQL NULL so callers can `coalesce` through fallback probes.
  * Interpreted eval is the same probe, so the expression is safe outside
  * codegen spans too.
  */
case class StringMapLookup(child: Expression, keys: Seq[String],
    values: Seq[Long]) extends UnaryExpression {
  require(keys.length == values.length,
    s"keys(${keys.length}) and values(${values.length}) differ in length")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"string_map_lookup requires STRING, got ${t.catalogString}")
  }

  /** Rebuilt after deserialization on each executor; probed per row. */
  @transient private lazy val table: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](keys.length * 2)
    var i = 0
    while (i < keys.length) {
      m.put(UTF8String.fromString(keys(i)), java.lang.Long.valueOf(values(i)))
      i += 1
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    table.get(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftLookupExpr", this, classOf[StringMapLookup].getName)
    val res = ctx.freshName("lookupRes")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long $res = $ref.probe($c);
      if ($res == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $res.longValue();
      }
    """)
  }

  /** Codegen entry point (the generated class can't see the lazy table). */
  def probe(k: UTF8String): java.lang.Long = table.get(k)

  override protected def withNewChildInternal(newChild: Expression): StringMapLookup =
    copy(child = newChild)
  override def prettyName: String = "string_map_lookup"
}

object LookupExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** O(1) hash-probe of `c` against a fixed string→long table; null on
    * miss (never throws, unlike ANSI `element_at`). */
  def stringMapLookup(c: Column, entries: Seq[(String, Long)]): Column =
    column(StringMapLookup(expression(c), entries.map(_._1), entries.map(_._2)))
}
