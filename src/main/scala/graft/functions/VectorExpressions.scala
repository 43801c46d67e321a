package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native, whole-stage-codegen'd dot product over two double arrays.
  *
  * The `functions._` route (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * allocates an intermediate array per row and evaluates interpreted
  * lambda closures (higher-order functions don't participate in codegen);
  * this expression compiles to a tight primitive loop inside the stage.
  * Null/length handling: min(len) elements, null array ⇒ null result;
  * array ELEMENTS are assumed non-null (embedding vectors).
  * Summation order is left-to-right — identical to the sequential
  * evaluation the DuckDB oracle performs, keeping float results
  * bit-comparable. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(l, r)
}

object VectorKernels {
  /** Index of the nearest centroid by cosine (ties → lowest index):
    * sim_i = dot(v, c_i) / (nrm · ‖c_i‖), left-to-right dot fold — the
    * exact per-operation arithmetic of the k-literal-column formulation
    * it replaces (`dot_product(v, lit(c)) / (nrm * lit(cn))` + greatest +
    * first-equal case chain), so assignments replay bit-identically. A
    * zero-norm centroid scores −1.0 (never NaN — see Clustering.assignTo's
    * rationale). Strictly-greater comparison ⇒ first index wins ties,
    * matching `when(sims(i) === greatest(...))` evaluation order. */
  def nearestCentroid(v: ArrayData, nrm: Double,
      cents: Array[Array[Double]], norms: Array[Double]): Long = {
    var best = Double.NegativeInfinity
    var idx = 0L
    var c = 0
    while (c < cents.length) {
      val sim =
        if (norms(c) == 0.0) -1.0
        else {
          val cv = cents(c)
          val n = math.min(v.numElements(), cv.length)
          var s = 0.0
          var i = 0
          while (i < n) { s += v.getDouble(i) * cv(i); i += 1 }
          s / (nrm * norms(c))
        }
      if (sim > best) { best = sim; idx = c.toLong }
      c += 1
    }
    idx
  }
}

/** Codegen'd nearest-centroid assignment (see
  * [[VectorKernels.nearestCentroid]]). The centroid matrix rides into
  * generated code as a REFERENCE OBJECT, not literals — successive Lloyd
  * rounds generate byte-identical source and hit the codegen cache
  * instead of paying a Janino compile per round. */
case class NearestCentroid(left: Expression, right: Expression,
    cents: Seq[Seq[Double]]) extends BinaryExpression {
  require(cents.nonEmpty, "need at least one centroid")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(DoubleType, _) if right.dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "nearest_centroid expects (array<double>, double), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  @transient private lazy val matrix: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  // same fold as Clustering's driver-side norm: sqrt of the left-fold sum
  @transient private lazy val norms: Array[Double] =
    matrix.map(c => math.sqrt(c.map(x => x * x).sum))

  override def nullSafeEval(v: Any, nrm: Any): Any =
    VectorKernels.nearestCentroid(v.asInstanceOf[ArrayData],
      nrm.asInstanceOf[Double], matrix, norms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centroids", matrix, "double[][]")
    val n = ctx.addReferenceObj("centroidNorms", norms, "double[]")
    defineCodeGen(ctx, ev, (v, nrm) =>
      s"graft.functions.VectorKernels.nearestCentroid($v, $nrm, $m, $n)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestCentroid =
    copy(left = l, right = r)
}

object VectorFunctions {
  /** dot(a, b) over array<double> columns — codegen'd. */
  def dot_product(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Index of the nearest centroid by cosine over (vector, norm) columns
    * — codegen'd, centroids as a plan-time reference object. */
  def nearest_centroid(v: Column, nrm: Column,
      cents: Seq[Seq[Double]]): Column =
    Bridge.column(NearestCentroid(
      Bridge.expression(v), Bridge.expression(nrm), cents))
}
