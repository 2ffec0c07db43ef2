package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, MapType}
import graft.functions.{Crc64Expr, GramHashes, LaneAgreement, LanesXxHash, MinhashSigs, MinhashSigsPacked, NfcNormalize, PackVec, PackedDot, PackedSketch, PqAdc, PqEncode, Simhash64}

/** §2.8 extension seam: graft's native Catalyst expressions as SQL
  * functions. Two entry points:
  *
  *  - session startup: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (the standard SparkSessionExtensions route);
  *  - an already-running session: `GraftExtensions.register(spark)`.
  *
  * After either, plain SQL can use the operators:
  * {{{
  *   SELECT crc64(encode(col, 'UTF-8')) FROM t
  *   SELECT packed_dot(pack_vec(CAST(a AS ARRAY<DOUBLE>)),
  *                     pack_vec(CAST(b AS ARRAY<DOUBLE>)))
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  /** (identifier, doc, builder) for every exposed function. */
  val definitions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("crc64"),
      info("crc64", "crc64(binary) - CRC64 (ECMA-182, reflected) of the bytes"),
      (args: Seq[Expression]) => Crc64Expr(args.head)),
    (FunctionIdentifier("pack_vec"),
      info("pack_vec", "pack_vec(array<double>) - pack into an 8-byte-per-" +
        "element binary vector for packed_dot"),
      (args: Seq[Expression]) => PackVec(args.head)),
    (FunctionIdentifier("packed_dot"),
      info("packed_dot", "packed_dot(binary, binary) - dot product of two " +
        "pack_vec vectors"),
      (args: Seq[Expression]) => PackedDot(args(0), args(1))),
    (FunctionIdentifier("packed_sketch"),
      info("packed_sketch", "packed_sketch(binary, planes, seed) - random-" +
        "hyperplane LSH sketch of a pack_vec vector"),
      (args: Seq[Expression]) => PackedSketch(args.head,
        litInt(args(1), "planes"), litInt(args(2), "seed"))),
    (FunctionIdentifier("minhash_sigs"),
      info("minhash_sigs", "minhash_sigs(string, k, n) - n-hash MinHash " +
        "signature over char-k-shingles of a normalized string"),
      (args: Seq[Expression]) => MinhashSigs(args.head,
        litInt(args(1), "k"), litInt(args(2), "n"))),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(string) - 64-bit SimHash of a " +
        "normalized (single-space-tokenized) string"),
      (args: Seq[Expression]) => Simhash64(args.head)),
    (FunctionIdentifier("gram_hashes"),
      info("gram_hashes", "gram_hashes(string, n) - distinct word-n-gram " +
        "hashes of a normalized string"),
      (args: Seq[Expression]) => GramHashes(args.head, litInt(args(1), "n"))),
    (FunctionIdentifier("minhash_sigs_packed"),
      info("minhash_sigs_packed", "minhash_sigs_packed(string, k, n) - " +
        "MinHash signature as one 8-bytes-per-hash binary (lane j equals " +
        "minhash_sigs(...)[j])"),
      (args: Seq[Expression]) => MinhashSigsPacked(args.head,
        litInt(args(1), "k"), litInt(args(2), "n"))),
    (FunctionIdentifier("lanes_xxhash"),
      info("lanes_xxhash", "lanes_xxhash(binary, start, count) - xxhash64 " +
        "fold over 8-byte lanes [start, start+count) of a packed signature " +
        "(equals xxhash64(h_start, ...) over the flat values)"),
      (args: Seq[Expression]) => LanesXxHash(args.head,
        litInt(args(1), "start"), litInt(args(2), "count"))),
    (FunctionIdentifier("lane_agreement"),
      info("lane_agreement", "lane_agreement(binary, binary) - count of " +
        "equal 8-byte lanes between two packed signatures"),
      (args: Seq[Expression]) => LaneAgreement(args(0), args(1))),
    (FunctionIdentifier("pq_encode"),
      info("pq_encode", "pq_encode(packed_vec, codebook, m, k) - product-" +
        "quantization codes (m bytes) of a packed vector against a packed " +
        "m*k*(dim/m)-double codebook"),
      (args: Seq[Expression]) => PqEncode(args(0), args(1),
        litInt(args(2), "m"), litInt(args(3), "k"))),
    (FunctionIdentifier("pq_adc"),
      info("pq_adc", "pq_adc(codes, table, k) - asymmetric-distance score: " +
        "sum of the query's precomputed per-subspace dots selected by each " +
        "code byte"),
      (args: Seq[Expression]) => PqAdc(args(0), args(1), litInt(args(2), "k"))),
    (FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(string) - Unicode NFC " +
        "composition (no-op fast path for already-normalized text)"),
      (args: Seq[Expression]) => NfcNormalize(args.head)),
    (FunctionIdentifier("bloom_might_contain"),
      info("bloom_might_contain", "bloom_might_contain(key_bigint, " +
        "filter_binary) - membership probe of a 64-bit key against a " +
        "serialized Bloom filter (foldable binary, e.g. from unhex)"),
      (args: Seq[Expression]) =>
        graft.functions.BloomMightContain(args.head, litBinary(args(1)))),
    (FunctionIdentifier("unigram_segment"),
      info("unigram_segment", "unigram_segment(word, map('piece', weight, " +
        "...), unk_weight) - Viterbi unigram-LM segmentation of a word " +
        "into vocabulary pieces under foldable fixed-point log-likelihood " +
        "weights (smallest-length tie-break; unknown single chars score " +
        "unk_weight)"),
      (args: Seq[Expression]) =>
        graft.functions.UnigramSegment(args.head, litWeightMap(args(1)),
          litLong(args(2), "unk_weight"))))

  private def litInt(e: Expression, name: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  private def litLong(e: Expression, name: String): Long = e match {
    case Literal(v: Long, LongType) => v
    case Literal(v: Int, IntegerType) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  /** Foldable binary expression → its bytes at plan-build time. */
  private def litBinary(e: Expression): Array[Byte] = {
    require(e.foldable && e.dataType == BinaryType,
      s"filter must be a foldable binary literal, got $e")
    e.eval(null).asInstanceOf[Array[Byte]]
  }

  /** Foldable map expression (e.g. `map('ab', -5, 'a', -9)`) → the weight
    * table a [[graft.functions.UnigramSegment]] needs at plan-build time. */
  private def litWeightMap(e: Expression): Map[String, Long] = {
    require(e.foldable && e.dataType.isInstanceOf[MapType],
      s"weights must be a foldable map<string,bigint> literal, got $e")
    val m = e.eval(null).asInstanceOf[
      org.apache.spark.sql.catalyst.util.MapData]
    val keys = m.keyArray()
    val vals = m.valueArray()
    val valueType = e.dataType.asInstanceOf[MapType].valueType
    (0 until m.numElements()).map { i =>
      val v = valueType match {
        case LongType => vals.getLong(i)
        case IntegerType => vals.getInt(i).toLong
        case other => throw new IllegalArgumentException(
          s"weight values must be integral, got $other")
      }
      keys.getUTF8String(i).toString -> v
    }.toMap
  }

  /** Register into an already-running session's function registry. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    definitions.foreach { case (ident, inf, builder) =>
      org.apache.spark.sql.GraftFunctionBridge
        .register(spark, ident, inf, builder)
    }
}
