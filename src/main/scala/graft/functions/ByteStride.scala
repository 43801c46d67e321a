package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Every `factor`-th byte of a binary column (offsets 0, factor, 2·factor…).
  *
  * Codegen'd replacement for the
  * `aggregate(filter(transform(sequence(…))))` formulation, which (a)
  * evaluated interpreted (HOFs are CodegenFallback) and (b) was quadratic —
  * the fold re-concatenated the accumulator once per kept byte. This is a
  * single linear copy. */
object ByteStrideKernel {
  def strided(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((bytes.length + factor - 1) / factor)
    var i = 0
    var j = 0
    while (i < bytes.length) { out(j) = bytes(i); i += factor; j += 1 }
    out
  }
}

case class ByteStride(child: Expression, factor: Int) extends UnaryExpression {
  require(factor >= 1, s"stride factor must be >= 1, got $factor")

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"byte_stride expects a binary input, got ${child.dataType.simpleString}")

  override def nullSafeEval(bytes: Any): Any =
    ByteStrideKernel.strided(bytes.asInstanceOf[Array[Byte]], factor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.ByteStrideKernel.strided($b, $factor)")

  override protected def withNewChildInternal(c: Expression): ByteStride = copy(child = c)
}

object ByteStrideFunctions {
  /** Every `factor`-th byte of a binary column — codegen'd. */
  def byte_stride(bytes: Column, factor: Int): Column =
    Bridge.column(ByteStride(Bridge.expression(bytes), factor))
}
