package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression for CRC64 (ECMA-182, reflected): generates a
  * direct static call inside whole-stage codegen, so checksum projection
  * fuses with the surrounding parse→cast→encode chain instead of breaking
  * the codegen span the way a Scala UDF would (SURVEY §2.8: the preference
  * order for extending — native Expression > UDF).
  */
case class Crc64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"crc64 requires BINARY input, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Crc64.checksum(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Crc64.checksum($c)")

  override protected def withNewChildInternal(newChild: Expression): Crc64Expr =
    copy(child = newChild)

  override def prettyName: String = "crc64"
}

object Crc64Expr {
  /** Column API: crc64 of a binary column (Column↔Expression via the
    * classic converter). */
  def crc64(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Crc64Expr(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}
