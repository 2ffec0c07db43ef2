package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Product-quantization kernels — the missing third leg of the ANN family
  * (LSH = oblivious buckets, IVF = coarse cells, PQ = compressed codes).
  * At 100 TB the corpus' raw vectors do not fit anywhere useful: PQ stores
  * m one-byte codes per vector (64× smaller than 64 packed doubles), and
  * a query scans CODES with a precomputed lookup table — no vector
  * arithmetic per candidate, just m table reads — which is what makes
  * exhaustive re-ranking over an IVF cell affordable at scale.
  *
  * Layouts (all little-endian doubles via the VecOps packing):
  *  - codebook: m×k×(dim/m) doubles as [subspace][centroid][component]
  *  - codes:    m bytes, codes(j) = index of subspace j's nearest centroid
  *  - ADC table: m×k doubles, table(j,c) = dot(query_j, centroid(j,c))
  * Scoring sums per-subspace partial inner products — the ADC
  * approximation of q·v, exact when v equals its reconstruction. */
object PqOps {

  @inline private def getD(a: Array[Byte], i: Int): Double =
    java.lang.Double.longBitsToDouble(org.apache.spark.unsafe.Platform.getLong(
      a, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + 8L * i))

  /** Nearest-centroid code per subspace (L2 within the subspace).
    * Validates sizes before the unchecked Platform reads: pq_encode is
    * registered as a SQL function, so arbitrary binaries can reach it, and
    * getD has no JVM bounds check — undersized inputs would read adjacent
    * heap instead of throwing. */
  def encode(vec: Array[Byte], codebook: Array[Byte], m: Int, k: Int): Array[Byte] = {
    val dim = vec.length / 8
    require(vec.length % 8 == 0 && dim % m == 0,
      s"pq_encode: packed vector length ${vec.length} not 8*dim with dim divisible by m=$m")
    require(codebook.length == m.toLong * k * (dim / m) * 8,
      s"pq_encode: codebook length ${codebook.length} != m*k*sub*8 = ${m.toLong * k * (dim / m) * 8}")
    val sub = dim / m
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        var d = 0.0
        var i = 0
        while (i < sub) {
          val x = getD(vec, j * sub + i) - getD(codebook, (j * k + c) * sub + i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  /** Asymmetric-distance score: sum of the query's precomputed
    * per-subspace dots with each code's centroid. */
  def adc(codes: Array[Byte], table: Array[Byte], k: Int): Double = {
    val m = codes.length
    // same rationale as encode: SQL-reachable + unchecked reads — a table
    // shorter than m*k doubles or a code byte >= k must fail loudly, not
    // read past the array
    require(table.length == m.toLong * k * 8,
      s"pq_adc: ADC table length ${table.length} != m*k*8 = ${m.toLong * k * 8}")
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = codes(j) & 0xFF
      require(c < k, s"pq_adc: code $c at subspace $j out of range (k=$k)")
      s += getD(table, j * k + c)
      j += 1
    }
    s
  }

  @inline private def putD(a: Array[Byte], i: Int, v: Double): Unit =
    org.apache.spark.unsafe.Platform.putLong(a,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + 8L * i,
      java.lang.Double.doubleToLongBits(v))

  /** Driver-side ADC table for one query: table(j,c) = dot(query's
    * subspace j, centroid(j,c)). m×k doubles — kilobytes, shipped to
    * executors as a literal. */
  def adcTable(query: Array[Double], codebook: Array[Byte], m: Int,
      k: Int): Array[Byte] = {
    require(query.length % m == 0,
      s"pq adcTable: query dim ${query.length} not divisible by m=$m")
    require(codebook.length == m.toLong * k * (query.length / m) * 8,
      s"pq adcTable: codebook length ${codebook.length} != m*k*sub*8 = ${m.toLong * k * (query.length / m) * 8}")
    val sub = query.length / m
    val out = new Array[Byte](m * k * 8)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        var s = 0.0
        var i = 0
        while (i < sub) {
          s += query(j * sub + i) * getD(codebook, (j * k + c) * sub + i)
          i += 1
        }
        putD(out, j * k + c, s)
        c += 1
      }
      j += 1
    }
    out
  }

  /** Reconstruction: concatenate each code's centroid (packed doubles) —
    * verification uses it to pin adc() == dot(query, decode()). */
  def decode(codes: Array[Byte], codebook: Array[Byte], k: Int): Array[Byte] = {
    val m = codes.length
    require(codebook.length % (8L * m * k) == 0 && codebook.length > 0,
      s"pq_decode: codebook length ${codebook.length} not a multiple of m*k*8 = ${8L * m * k}")
    val sub = codebook.length / 8 / (m * k)
    val out = new Array[Byte](m * sub * 8)
    var j = 0
    while (j < m) {
      val c = codes(j) & 0xFF
      require(c < k, s"pq_decode: code $c at subspace $j out of range (k=$k)")
      System.arraycopy(codebook, ((j * k + c) * sub) * 8, out, (j * sub) * 8,
        sub * 8)
      j += 1
    }
    out
  }
}

/** `pq_encode(packed_vec, codebook) -> binary(m)` — see PqOps. */
case class PqEncode(left: Expression, right: Expression, m: Int, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires (BINARY, BINARY), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def nullSafeEval(v: Any, cb: Any): Any =
    PqOps.encode(v.asInstanceOf[Array[Byte]], cb.asInstanceOf[Array[Byte]], m, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, cb) => s"graft.functions.PqOps.encode($v, $cb, $m, $k)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqEncode = copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_encode"
}

/** `pq_adc(codes, table) -> double` — see PqOps. */
case class PqAdc(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires (BINARY, BINARY), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def nullSafeEval(codes: Any, table: Any): Any =
    PqOps.adc(codes.asInstanceOf[Array[Byte]], table.asInstanceOf[Array[Byte]], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (c, t) => s"graft.functions.PqOps.adc($c, $t, $k)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdc = copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_adc"
}

object PqExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def pqEncode(vec: Column, codebook: Column, m: Int, k: Int): Column =
    column(PqEncode(expression(vec), expression(codebook), m, k))

  def pqAdc(codes: Column, table: Column, k: Int): Column =
    column(PqAdc(expression(codes), expression(table), k))
}
