package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Imperative ordered-series kernels called from generated code — same
  * rationale as [[TextKernels]]: a sequential fold written with the
  * `aggregate` higher-order function runs INTERPRETED (CodegenFallback)
  * and destabilizes warm-session JIT profiles; a static monomorphic
  * kernel call per row does not. */
object SeriesKernels {

  /** Running exponentially-weighted moving average of `xs` at smoothing
    * `alpha`: out(0) = xs(0); out(t) = alpha·xs(t) + (1−alpha)·out(t−1).
    * Strict left-to-right IEEE evaluation — with a dyadic alpha the
    * multiply by alpha is exact for integer-valued inputs, and every
    * step is the same two roundings in any engine folding in the same
    * order (DuckDB: `list_reduce`), so outputs replay bit-identically.
    * NULL elements are not expected (inputs are aggregate counts). */
  def ewma(xs: ArrayData, alpha: Double): ArrayData = {
    val n = xs.numElements()
    val out = new Array[Any](n)
    val beta = 1.0 - alpha
    var acc = 0.0
    var i = 0
    while (i < n) {
      // enforce the null-free contract instead of silently reading a null
      // slot as 0.0 (the function is on the public spark.sql surface)
      if (xs.isNullAt(i)) throw new IllegalArgumentException(
        s"ewma: null element at position $i — inputs must be null-free")
      val x = xs.getDouble(i)
      acc = if (i == 0) x else alpha * x + beta * acc
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Strict left-to-right IEEE sum of `xs` from a 0.0 seed — the
    * canonical-order float sum both engines can replay exactly (DuckDB:
    * `list_reduce(list_prepend(0.0, xs), (a, x) -> a + x)`). Written as a
    * kernel because the equivalent `aggregate` higher-order function runs
    * INTERPRETED — it was the worst honest bench ratio on the board
    * (text_bm25_batch, r7). NULL elements rejected as in [[ewma]]. */
  def seqSum(xs: ArrayData): Double = {
    val n = xs.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) throw new IllegalArgumentException(
        s"seqSum: null element at position $i — inputs must be null-free")
      acc += xs.getDouble(i)
      i += 1
    }
    acc
  }
}

/** Codegen'd running EWMA over an ARRAY<DOUBLE> (see
  * [[SeriesKernels.ewma]]). `alpha` is fixed at plan time. NULL array ⇒
  * NULL. */
case class EwmaArray(child: Expression, alpha: Double)
    extends UnaryExpression {

  require(alpha > 0.0 && alpha <= 1.0,
    s"ewma: alpha must be in (0, 1], got $alpha")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull=true is accepted (a Cast can widen the flag) but the
    // VALUES must be null-free — inputs are aggregate counts
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ewma expects array<double>, got ${t.simpleString}")
  }

  override def nullSafeEval(xs: Any): Any =
    SeriesKernels.ewma(xs.asInstanceOf[ArrayData], alpha)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      x => s"graft.functions.SeriesKernels.ewma($x, ${alpha}D)")

  override protected def withNewChildInternal(c: Expression): EwmaArray =
    copy(child = c)
}

/** Codegen'd left-to-right 0.0-seeded sum over an ARRAY<DOUBLE> (see
  * [[SeriesKernels.seqSum]]). NULL array ⇒ NULL; empty array ⇒ 0.0. */
case class SeqSum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"seq_sum expects array<double>, got ${t.simpleString}")
  }

  override def nullSafeEval(xs: Any): Any =
    SeriesKernels.seqSum(xs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.SeriesKernels.seqSum($x)")

  override protected def withNewChildInternal(c: Expression): SeqSum =
    copy(child = c)
}

object SeriesFunctions {
  /** ewma(xs, alpha): running exponentially-weighted moving average. */
  def ewma(xs: Column, alpha: Double): Column =
    Bridge.column(EwmaArray(Bridge.expression(xs), alpha))

  /** seq_sum(xs): strict left-to-right sum from a 0.0 seed. */
  def seqSum(xs: Column): Column =
    Bridge.column(SeqSum(Bridge.expression(xs)))
}
