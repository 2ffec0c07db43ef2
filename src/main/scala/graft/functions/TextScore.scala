package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ONE-PASS quality/language scoring kernels (optimization r18).
  *
  * [[graft.operators.TextAnalysis.qualityScore]] / `langId` were pure
  * `functions._` trees: per language marker the formula re-scanned the
  * padded lowercase text with `length(replace(...))` — 25 markers × a
  * full-copy `replace` allocation each, and the tree was evaluated
  * again wherever the optimizer duplicated it (pushed filters inline
  * the whole tree below the projection; filter codegen has no common-
  * subexpression elimination). Measured on the sf0.1 documents corpus
  * the scored projection cost ~2 s of single-core time for ~half a MiB
  * of input — tens of GiB/s of redundant string scanning at 100 TB.
  *
  * These expressions compute the IDENTICAL values in one kernel call:
  * one byte scan for length classes (alpha / punct / token runs), one
  * `toLowerCase`, one padded copy, and per marker a zero-allocation
  * non-overlapping indexOf count with the exact `replace` semantics
  * (advance past each match) the Column formula — and the DuckDB
  * oracle replay — use. Every output is bit-identical by construction
  * and locked by `TextScoreSpec` against the legacy Column trees.
  *
  * NULL contract (matches the legacy trees exactly): the old formulas
  * folded NULL text to quality 0 / lang 'und' (every `when` fell
  * through to its `otherwise`), so these expressions are non-nullable
  * and return the same constants on NULL input.
  */
object TextScore {

  /** Language marker table — the single source of truth
    * ([[graft.operators.TextAnalysis.langMarkers]] aliases this; the
    * SQL generators replay it). Deterministic argmax tie order is the
    * Seq order: en, de, fr, es, zh. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "de", "y", "es"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  /** UTF-8 bytes of each padded marker (" w "), grouped per language —
    * the needle the legacy formula searched with `replace` on
    * `' ' || lower(text) || ' '`. */
  private val markerBytes: Array[Array[Array[Byte]]] =
    langMarkers.map(_._2.map(w => (" " + w + " ").getBytes("UTF-8"))
      .toArray).toArray

  private val langNames: Array[UTF8String] =
    langMarkers.map(p => UTF8String.fromString(p._1)).toArray
  private val und = UTF8String.fromString("und")

  /** Non-overlapping occurrence count of `pat` in `hay`, advancing past
    * each match — exactly the count `replace(hay, pat, '')` removes
    * (UTF8String.replace scans left-to-right and skips the matched
    * bytes). Byte-wise match is safe in valid UTF-8: the needle starts
    * and ends with 0x20, which never occurs inside a multi-byte
    * sequence. */
  private def countOcc(hay: Array[Byte], hayLen: Int,
      pat: Array[Byte]): Long = {
    val pl = pat.length
    var n = 0L
    var i = 0
    val limit = hayLen - pl
    while (i <= limit) {
      var j = 0
      while (j < pl && hay(i + j) == pat(j)) j += 1
      if (j == pl) { n += 1; i += pl } else i += 1
    }
    n
  }

  /** Marker score per language over `' ' + lower(text) + ' '`. */
  private def langScoresOf(text: UTF8String): Array[Long] = {
    val lowered = text.toLowerCase.getBytes
    val padded = new Array[Byte](lowered.length + 2)
    padded(0) = ' '
    System.arraycopy(lowered, 0, padded, 1, lowered.length)
    padded(padded.length - 1) = ' '
    val scores = new Array[Long](markerBytes.length)
    var l = 0
    while (l < markerBytes.length) {
      val ws = markerBytes(l)
      var s = 0L
      var w = 0
      while (w < ws.length) {
        s += countOcc(padded, padded.length, ws(w)); w += 1
      }
      scores(l) = s
      l += 1
    }
    scores
  }

  /** Deterministic argmax (ties: first in table order); 'und' when no
    * marker hits — identical to the legacy when-chain. */
  def langId(text: UTF8String): UTF8String = {
    if (text == null) return und
    val scores = langScoresOf(text)
    var best = 0L
    var i = 0
    while (i < scores.length) {
      if (scores(i) > best) best = scores(i); i += 1
    }
    if (best <= 0) return und
    i = 0
    while (i < scores.length && scores(i) != best) i += 1
    langNames(i)
  }

  /** Quality score in [0,100] — bit-identical to the legacy formula:
    * length band + alpha ratio + stopword presence + token-length band
    * − punctuation excess, all integer comparisons.
    *
    * Component semantics replicated exactly:
    * - len   = length(text): Unicode code points (UTF8String.numChars)
    * - alpha = length(regexp_replace(text, "[^a-zA-Z]", "")): count of
    *           ASCII letters (ASCII bytes never occur inside multi-byte
    *           UTF-8 sequences, so a byte scan is exact)
    * - punct = same for the [!?.,;:] set
    * - toks  = size(filter(split(trim(text), "\\s+"), _ != "")): trim
    *           strips 0x20 only; Java regex \s is [ \t\n\x0B\f\r]; the
    *           surviving count is the number of maximal non-\s runs
    *           (leading/interior empties are filtered, and split's
    *           limit -1 keeps no trailing matter a run count would
    *           miss) — all ASCII classes, so byte-exact
    * - stop  = langId != 'und' ⇔ some marker hit (best > 0) */
  def qualityScore(text: UTF8String): Long = {
    if (text == null) return 0L
    val bytes = text.getBytes
    val nBytes = bytes.length
    val len = text.numChars().toLong
    var alpha = 0L
    var punct = 0L
    var toks = 0L
    var inRun = false
    var i = 0
    while (i < nBytes) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')) alpha += 1
      else if (b == '!' || b == '?' || b == '.' || b == ',' ||
          b == ';' || b == ':') punct += 1
      val ws = b == ' ' || b == '\t' || b == '\n' || b == 0x0B ||
        b == '\f' || b == '\r'
      if (!ws && !inRun) { toks += 1; inRun = true }
      else if (ws) inRun = false
      i += 1
    }
    val lenScore =
      if (len >= 100 && len <= 2000) 40L
      else if (len >= 20 && len <= 99) 20L
      else 0L
    val alphaScore =
      if (alpha * 10 >= len * 7) 20L
      else if (alpha * 10 >= len * 5) 10L
      else 0L
    val scores = langScoresOf(text)
    var best = 0L
    i = 0
    while (i < scores.length) {
      if (scores(i) > best) best = scores(i); i += 1
    }
    val stopScore = if (best > 0) 20L else 0L
    val punctPenalty = if (punct * 10 > len) 20L else 0L
    val tokScore =
      if (toks > 0 && len >= toks * 4 && len <= toks * 10) 10L else 0L
    val q = lenScore + alphaScore + stopScore + tokScore - punctPenalty
    math.max(math.min(q, 100L), 0L)
  }

  /** Column API. */
  def qualityScoreCol(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      QualityScoreExpr(org.apache.spark.sql.GraftColumnBridge.expression(c)))

  def langIdCol(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      LangIdExpr(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}

/** `quality_score(text)` — one-pass, codegen'd, non-nullable (NULL→0,
  * the legacy tree's fold). */
case class QualityScoreExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quality_score requires STRING input, got ${child.dataType.catalogString}")

  override def eval(input: InternalRow): Any =
    TextScore.qualityScore(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      long ${ev.value} = graft.functions.TextScore.qualityScore(
        ${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): QualityScoreExpr = copy(child = newChild)

  override def prettyName: String = "quality_score"
}

/** `lang_id(text)` — one-pass, codegen'd, non-nullable (NULL→'und'). */
case class LangIdExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lang_id requires STRING input, got ${child.dataType.catalogString}")

  override def eval(input: InternalRow): Any =
    TextScore.langId(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      UTF8String ${ev.value} = graft.functions.TextScore.langId(
        ${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): LangIdExpr = copy(child = newChild)

  override def prettyName: String = "lang_id"
}
