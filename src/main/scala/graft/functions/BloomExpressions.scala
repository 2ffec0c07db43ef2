package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a native codegen expression.
  *
  * The pruning half of two-phase exact cross-corpus dedup
  * ([[graft.operators.Dedup.crossExactFlags]]): a Bloom filter over the
  * base corpus's 64-bit content fingerprints rides into every task as a
  * plan reference object and prunes the new corpus to probable-duplicates
  * BEFORE any join — the same executor-side membership-probe shape
  * Spark's own runtime row-level filtering injects, but available as an
  * explicit operator. The filter is carried as its serialized bytes
  * (compact, immutable) and deserialized once per executor on first use.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires BIGINT input, got ${child.dataType.catalogString}")

  @transient private lazy val probe: BloomOps.Probe =
    new BloomOps.Probe(bloomBytes)

  override def nullSafeEval(input: Any): Any =
    probe.get.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", probe,
      classOf[BloomOps.Probe].getName)
    defineCodeGen(ctx, ev, c => s"$ref.get().mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"

  // the byte array would use reference equality; compare content (the
  // canonical-form caches key on expression equality)
  override def equals(other: Any): Boolean = other match {
    case BloomMightContain(c, b) =>
      c == child && java.util.Arrays.equals(b, bloomBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)
}

object BloomOps {

  /** Serialized-form holder: ships compact bytes, deserializes the sketch
    * lazily once per JVM use-site. */
  final class Probe(bytes: Array[Byte]) extends Serializable {
    @transient private lazy val bf: BloomFilter =
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
    def get: BloomFilter = bf
  }

  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Column API: probe a Long column against a built filter. */
  def mightContain(c: Column, bloomBytes: Array[Byte]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BloomMightContain(
        org.apache.spark.sql.GraftColumnBridge.expression(c), bloomBytes))
}
