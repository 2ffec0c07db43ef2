package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-sketch kernels (MinHash) as single static calls per document.
  *
  * The DataFrame formulation of MinHash — explode char-k-shingles, then
  * `numHashes` min-aggregates — multiplies every document into ~|doc| rows
  * and shuffles them back into per-doc signatures: correct, codegen'd, but
  * the explode+aggregate machinery dominates the pass. This kernel computes
  * the whole signature in ONE pass over the document's UTF-8 bytes: a
  * sliding char window (byte-offset walk, O(n) total — no per-shingle
  * substring), one string hash per shingle, `numHashes` int-hash folds.
  * The plan becomes a narrow projection — no explode, no aggregate, and
  * the only shuffle left is the barrier moving (id, 32×8 B) rows.
  *
  * BIT-IDENTICAL to the Column form by construction: Spark's
  * `xxhash64(shingle, j)` folds XXH64.hashInt(j, hashUnsafeBytes(shingle,
  * seed=42)) — reproduced here over the same shingle byte ranges
  * (whole-string shingle when |doc| < k, the empty shingle for an empty
  * doc, duplicates kept — min() is multiset-invariant).
  */
object SketchOps {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.unsafe.Platform

  def minhashSigs(s: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // char-boundary byte offsets (UTF-8 walk)
    val offs = new Array[Int](s.numChars() + 1)
    var i = 0; var off = 0
    while (off < len) {
      offs(i) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      i += 1
    }
    val nChars = i
    offs(nChars) = len
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val nShingles = math.max(nChars - k, 0) + 1
    var sh = 0
    while (sh < nShingles) {
      val start = offs(sh)
      val end = offs(math.min(sh + k, nChars))
      val hs = XXH64.hashUnsafeBytes(bytes,
        Platform.BYTE_ARRAY_OFFSET + start, end - start, 42L)
      var j = 0
      while (j < numHashes) {
        val h = XXH64.hashInt(j, hs)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      sh += 1
    }
    new GenericArrayData(mins)
  }

  /** `minhashSigs` writing straight into a packed binary (8 B per hash,
    * little-endian via Platform — the VecOps layout): ONE BinaryType
    * column instead of `numHashes` flat longs. Wide flat-column band-join
    * plans cost seconds of janino COMPILE each (the round-3 lesson from
    * embedding vectors); the packed form compiles in milliseconds and
    * carries the identical values (lane j == sigs[j] — pinned by test). */
  def minhashSigsPacked(s: UTF8String, k: Int, numHashes: Int): Array[Byte] = {
    val arr = minhashSigs(s, k, numHashes)
    val out = new Array[Byte](numHashes * 8)
    var j = 0
    while (j < numHashes) {
      Platform.putLong(out, Platform.BYTE_ARRAY_OFFSET + 8L * j,
        arr.getLong(j))
      j += 1
    }
    out
  }

  /** XXH64 fold over `count` 8-byte lanes of a packed signature starting
    * at lane `start` — BIT-IDENTICAL to Spark's `xxhash64(h_start, …,
    * h_{start+count-1})` over the flat columns (seed 42, each value
    * hashed with the running hash as seed), so packed band keys equal the
    * flat formulation's. */
  def lanesXxHash(bin: Array[Byte], start: Int, count: Int): Long = {
    var acc = 42L
    var i = 0
    while (i < count) {
      acc = XXH64.hashLong(Platform.getLong(bin,
        Platform.BYTE_ARRAY_OFFSET + 8L * (start + i)), acc)
      i += 1
    }
    acc
  }

  /** Number of equal 8-byte lanes between two packed signatures — the
    * MinHash agreement count (estimator numerator). */
  def laneAgreement(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length) / 8
    var c = 0
    var i = 0
    while (i < n) {
      val off = Platform.BYTE_ARRAY_OFFSET + 8L * i
      if (Platform.getLong(a, off) == Platform.getLong(b, off)) c += 1
      i += 1
    }
    c
  }

  /** Distinct char-k-shingle hashes of a pre-normalized string — the same
    * sliding-window byte walk as `minhashSigs`, collecting the distinct
    * shingle hashes instead of folding mins (for exact-Jaccard joins over
    * shingles; hash values equal Spark's `xxhash64(shingle)`). */
  def shingleHashes(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    val offs = new Array[Int](s.numChars() + 1)
    var i = 0; var off = 0
    while (off < len) {
      offs(i) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      i += 1
    }
    val nChars = i
    offs(nChars) = len
    val nShingles = math.max(nChars - k, 0) + 1
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var sh = 0
    while (sh < nShingles) {
      val start = offs(sh)
      val end = offs(math.min(sh + k, nChars))
      val h = XXH64.hashUnsafeBytes(bytes,
        Platform.BYTE_ARRAY_OFFSET + start, end - start, 42L)
      if (seen.add(h)) out += h
      sh += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Distinct word-n-gram hashes of a pre-normalized string: because
    * normalization collapses whitespace to single spaces and `gramsOf`
    * joins with a single space, every n-gram's text is a CONTIGUOUS byte
    * range of the input — so the gram hash (Spark's string xxhash64,
    * seed 42, the same value `exactJaccardPairs` derives from the gram
    * string) computes straight off the token-boundary offsets, with no
    * gram strings ever materialized. Matches gramsOf's edge semantics:
    * < n tokens → one gram of whatever remains; zero tokens → the single
    * empty gram. Distinct-by-hash ≡ distinct-by-string for the join
    * counts (64-bit collisions are noise, and the DuckDB gate would
    * catch one loudly). */
  def gramHashes(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // token [start, end) offsets
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
    var start = 0
    var off = 0
    while (off <= len) {
      if (off == len || bytes(off) == 0x20) {
        if (off > start) { starts += start; ends += off }
        start = off + 1
      }
      off += 1
    }
    val nTok = starts.length
    val nGrams = math.max(nTok - n, 0) + 1
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i < nGrams) {
      val (gs, ge) =
        if (nTok == 0) (0, 0) // the single empty gram
        else (starts(i), ends(math.min(i + n, nTok) - 1))
      val h = XXH64.hashUnsafeBytes(bytes,
        Platform.BYTE_ARRAY_OFFSET + gs, ge - gs, 42L)
      if (seen.add(h)) out += h
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** 64-bit SimHash of a pre-normalized string (single-space tokens):
    * one pass — split at 0x20 (never part of a UTF-8 multibyte sequence),
    * hash each token with Spark's string xxhash64 (seed 42), fold signed
    * bit counts, pack (bit i of the token hash votes bit 63-i of the
    * sketch — the same order as the Column form's shiftleft fold).
    * Callers must drop empty-normalized docs first: the explode-based
    * formulation emits no row for a tokenless doc, and this kernel's
    * all-zero-counts sketch would otherwise invent one. */
  def simhash(s: UTF8String): Long = {
    val bytes = s.getBytes
    val len = bytes.length
    val counts = new Array[Int](64)
    var start = 0
    var off = 0
    while (off <= len) {
      if (off == len || bytes(off) == 0x20) {
        if (off > start) {
          val h = XXH64.hashUnsafeBytes(bytes,
            Platform.BYTE_ARRAY_OFFSET + start, off - start, 42L)
          var i = 0
          while (i < 64) {
            counts(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
            i += 1
          }
        }
        start = off + 1
      }
      off += 1
    }
    var acc = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) acc |= (1L << (63 - i))
      i += 1
    }
    acc
  }
}

/** `minhash_sigs(string) -> array<bigint>` — see SketchOps. */
case class MinhashSigs(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires STRING, got ${t.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    SketchOps.minhashSigs(input.asInstanceOf[UTF8String], k, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchOps.minhashSigs($c, $k, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
  override def prettyName: String = "minhash_sigs"
}

/** `gram_hashes(string) -> array<bigint>` — see SketchOps.gramHashes. */
case class GramHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_hashes requires STRING, got ${t.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    SketchOps.gramHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.gramHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
  override def prettyName: String = "gram_hashes"
}

/** `shingle_hashes(string) -> array<bigint>` — see SketchOps.shingleHashes. */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires STRING, got ${t.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    SketchOps.shingleHashes(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.shingleHashes($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "shingle_hashes"
}

/** `minhash_sigs_packed(string) -> binary` — see SketchOps. */
case class MinhashSigsPacked(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs_packed requires STRING, got ${t.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    SketchOps.minhashSigsPacked(input.asInstanceOf[UTF8String], k, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchOps.minhashSigsPacked($c, $k, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinhashSigsPacked =
    copy(child = newChild)
  override def prettyName: String = "minhash_sigs_packed"
}

/** `lanes_xxhash(binary) -> bigint` — see SketchOps.lanesXxHash. */
case class LanesXxHash(child: Expression, start: Int, count: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lanes_xxhash requires BINARY, got ${t.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    SketchOps.lanesXxHash(input.asInstanceOf[Array[Byte]], start, count)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchOps.lanesXxHash($c, $start, $count)")
  override protected def withNewChildInternal(newChild: Expression): LanesXxHash =
    copy(child = newChild)
  override def prettyName: String = "lanes_xxhash"
}

/** `lane_agreement(binary, binary) -> int` — see SketchOps.laneAgreement. */
case class LaneAgreement(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lane_agreement requires (BINARY, BINARY), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def nullSafeEval(a: Any, b: Any): Any =
    SketchOps.laneAgreement(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SketchOps.laneAgreement($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LaneAgreement =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "lane_agreement"
}

/** `simhash64(string) -> bigint` — see SketchOps.simhash. */
case class Simhash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires STRING, got ${t.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    SketchOps.simhash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

object SketchExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** MinHash signature array of a (pre-normalized) string column. */
  def minhashSigs(c: Column, k: Int, numHashes: Int): Column =
    column(MinhashSigs(expression(c), k, numHashes))

  /** MinHash signature as ONE packed binary column (8 B per hash). */
  def minhashSigsPacked(c: Column, k: Int, numHashes: Int): Column =
    column(MinhashSigsPacked(expression(c), k, numHashes))

  /** xxhash64 fold over lanes [start, start+count) of a packed signature
    * — equals `xxhash64(h_start, …)` over the flat columns. */
  def lanesXxHash(c: Column, start: Int, count: Int): Column =
    column(LanesXxHash(expression(c), start, count))

  /** Count of equal 8-byte lanes between two packed signatures. */
  def laneAgreement(a: Column, b: Column): Column =
    column(LaneAgreement(expression(a), expression(b)))

  /** 64-bit SimHash of a (pre-normalized) string column. */
  def simhash64(c: Column): Column = column(Simhash64(expression(c)))

  /** Distinct word-n-gram hash array of a (pre-normalized) string column. */
  def gramHashes(c: Column, n: Int): Column =
    column(GramHashes(expression(c), n))

  /** Distinct char-k-shingle hash array of a (pre-normalized) string column. */
  def shingleHashes(c: Column, k: Int): Column =
    column(ShingleHashes(expression(c), k))
}
