package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst kernel for Σ aᵢ·bᵢ over two numeric array columns.
  *
  * Bit-identical to the HOF formulation
  * `aggregate(zip_with(a, b, x.cast(double) * y.cast(double)), 0.0, +)`
  * — same widening, same ascending left-fold order — which in turn is
  * what the external SQL oracles unroll term by term. The HOF version
  * materializes a fresh 64-double array per evaluation (zip_with) and
  * walks it through two lambda dispatches; this kernel is one fused
  * while-loop with zero allocation — the per-pair hot path of every
  * similarity verify (brute-force kNN, LSH re-rank, IVF probe,
  * embedding near-dup) and the per-plane projection of the LSH keys.
  *
  * Contract: equal-length arrays of non-null floats/doubles (the
  * embedding-column invariant). Length mismatch throws — loud beats
  * the HOF's silent null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.DotProduct.compute($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Java-callable kernel (referenced from generated code). */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"dot_product: length mismatch ${n} vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  /** Column-facing constructor. */
  def dot(a: Column, b: Column): Column = {
    val br = org.apache.spark.sql.graftbridge.ExpressionBridge
    br.column(DotProduct(br.expression(a), br.expression(b)))
  }
}
