package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM Viterbi segmentation (SentencePiece's inference step — Kudo
  * 2018, arXiv:1804.10959 §3) as a native expression: split a word into the
  * vocabulary pieces maximizing the summed piece log-likelihoods.
  *
  * ENGINE-EXACT by construction: the weights are INTEGER fixed-point
  * log-likelihoods (floor(1e6·ln p), computed once driver-side), so the DP
  * is pure Long arithmetic — a SQL oracle replaying the same recurrence
  * from the same literal weights reproduces every segmentation bit-for-bit
  * (the device that makes `txt_unigram` hash-matchable, where float Viterbi
  * would be 1-ulp engine-dependent).
  *
  * DP contract (the oracle mirrors each clause):
  *  - dp(0) = 0; dp(i) = max over piece lengths L = 1..maxPieceLen, L ≤ i
  *    of dp(i−L) + w(word[i−L..i)), where a length-1 piece ALWAYS
  *    participates (unknown single chars get `unkWeight`) and longer
  *    pieces participate only when in the vocabulary.
  *  - ties pick the SMALLEST L (candidates scanned ascending, strict `>`).
  *  - backtrace re-picks the smallest L achieving dp(i) at each step.
  *
  * Positions are Unicode code points (the same character axis as Spark's
  * `substring`/`split(w, "")` and DuckDB's `substr`); the walk is a single
  * byte-offset pass, no per-piece decode. The vocab ships inside the plan
  * as a shared reference object — tokenizer vocabularies are bounded
  * (≤100k pieces), the same shape as production tokenizers broadcasting
  * their piece table to every task.
  */
case class UnigramSegment(child: Expression, weights: Map[String, Long],
    unkWeight: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unigram_segment requires STRING input, got ${child.dataType.catalogString}")

  @transient private lazy val table: UnigramOps.Table =
    UnigramOps.buildTable(weights, unkWeight)

  override def nullSafeEval(input: Any): Any =
    UnigramOps.viterbi(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table,
      classOf[UnigramOps.Table].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.UnigramOps.viterbi($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)

  override def prettyName: String = "unigram_segment"
}

object UnigramOps {

  /** Executor-side lookup structure: UTF8String-keyed hash map (no decode
    * on the probe path) + the max piece length bounding the DP fan-in. */
  final class Table(val wts: java.util.HashMap[UTF8String, java.lang.Long],
      val maxLen: Int, val unk: Long) extends Serializable

  def buildTable(weights: Map[String, Long], unkWeight: Long): Table = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](
      math.max(16, weights.size * 2))
    var maxLen = 1
    weights.foreach { case (p, w) =>
      m.put(UTF8String.fromString(p), java.lang.Long.valueOf(w))
      val n = p.codePointCount(0, p.length)
      if (n > maxLen) maxLen = n
    }
    new Table(m, maxLen, unkWeight)
  }

  def viterbi(word: UTF8String, t: Table): ArrayData = {
    val bytes = word.getBytes
    val len = bytes.length
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    // code-point boundary byte offsets (same walk as SketchOps.minhashSigs)
    val offs = new Array[Int](word.numChars() + 1)
    var i = 0; var off = 0
    while (off < len) {
      offs(i) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      i += 1
    }
    val n = i
    offs(n) = len
    val dp = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    i = 1
    while (i <= n) {
      var best = Long.MinValue
      var bl = 1
      var L = 1
      val lmax = math.min(t.maxLen, i)
      while (L <= lmax) {
        val piece = UTF8String.fromBytes(bytes, offs(i - L), offs(i) - offs(i - L))
        val w = t.wts.get(piece)
        if (w != null) {
          val cand = dp(i - L) + w.longValue()
          if (cand > best) { best = cand; bl = L }
        } else if (L == 1) {
          // unknown single char always participates at the UNK weight
          val cand = dp(i - 1) + t.unk
          if (cand > best) { best = cand; bl = 1 }
        }
        L += 1
      }
      dp(i) = best
      back(i) = bl
      i += 1
    }
    // backtrace: count pieces, then fill front-to-back
    var pos = n
    var np = 0
    while (pos > 0) { np += 1; pos -= back(pos) }
    val out = new Array[Any](np)
    pos = n
    var j = np - 1
    while (pos > 0) {
      val L = back(pos)
      out(j) = UTF8String.fromBytes(bytes, offs(pos - L), offs(pos) - offs(pos - L))
      j -= 1
      pos -= L
    }
    new GenericArrayData(out)
  }

  /** Column API. */
  def unigramSegment(c: Column, weights: Map[String, Long],
      unkWeight: Long): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      UnigramSegment(org.apache.spark.sql.GraftColumnBridge.expression(c),
        weights, unkWeight))
}
