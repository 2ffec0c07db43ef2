package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.Crc64Expr

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for SQL use (`SELECT crc64(binary_col) …`).
  *
  * Usage: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("crc64"),
      new ExpressionInfo(classOf[Crc64Expr].getName, "crc64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Crc64Expr(children.head)))
  }
}
