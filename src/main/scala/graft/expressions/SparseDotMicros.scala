package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native sparse dot product over two sorted (key, value-micros)
  * array pairs — the per-pair hot path of all-pairs cosine similarity
  * (TF-IDF q41): a two-pointer merge in primitive longs instead of a
  * per-pair hash-map probe or a corpus-sized (pair, term) shuffle.
  *
  * Values are 6-decimal weights scaled to integral micros (w·10⁶ as
  * long), so every product is exact (micros² ≤ 2.5e15 per term,
  * vocabulary-bounded sums stay far under 2⁶³) and the final double is
  * produced by the correctly-rounded BigDecimal(Σ, scale 12)
  * conversion — bit-identical to `CAST(SUM(wa*wb) AS DOUBLE)` over
  * DECIMAL(18,6) columns in any engine, which is what keeps the
  * DuckDB oracle exact while the kernel never touches a BigDecimal
  * until the very end.
  *
  * Contract: keys strictly ascending (array_sort over unique keys),
  * keys.length == vals.length, no null slots. Keys are 64-bit term
  * hashes — the same 2⁻⁶⁴-collision currency as the near-dup
  * pipelines.
  */
case class SparseDotMicros(aKeys: Expression, aVals: Expression,
    bKeys: Expression, bVals: Expression) extends QuaternaryExpression {

  override def first: Expression = aKeys
  override def second: Expression = aVals
  override def third: Expression = bKeys
  override def fourth: Expression = bVals

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sparse_dot_micros"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires four array<bigint> inputs, got " +
        children.map(_.dataType.catalogString).mkString(", "))
  }

  override protected def nullSafeEval(ak: Any, av: Any, bk: Any, bv: Any): Any =
    SparseDotMicros.compute(
      ak.asInstanceOf[ArrayData], av.asInstanceOf[ArrayData],
      bk.asInstanceOf[ArrayData], bv.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ak, av, bk, bv) =>
      s"graft.expressions.SparseDotMicros.compute($ak, $av, $bk, $bv)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(aKeys = newFirst, aVals = newSecond,
      bKeys = newThird, bVals = newFourth)
}

object SparseDotMicros {

  /** Java-callable kernel (referenced from generated code). Null slots
    * (key or value) are skipped — a null entry contributes nothing,
    * rather than being misread as key/value 0.
    */
  def compute(ak: ArrayData, av: ArrayData,
      bk: ArrayData, bv: ArrayData): Double = {
    val n = ak.numElements()
    val m = bk.numElements()
    var sum = 0L
    var i = 0
    var j = 0
    while (i < n && j < m) {
      if (ak.isNullAt(i) || av.isNullAt(i)) i += 1
      else if (bk.isNullAt(j) || bv.isNullAt(j)) j += 1
      else {
        val ka = ak.getLong(i)
        val kb = bk.getLong(j)
        if (ka == kb) {
          sum += av.getLong(i) * bv.getLong(j)
          i += 1; j += 1
        } else if (ka < kb) i += 1
        else j += 1
      }
    }
    // correctly-rounded Σ·10⁻¹² — the DECIMAL(38,12) → double cast
    if (sum == 0L) 0.0
    else new java.math.BigDecimal(java.math.BigInteger.valueOf(sum), 12)
      .doubleValue()
  }

  /** Column-facing constructor. */
  def sparseDotMicros(aKeys: Column, aVals: Column,
      bKeys: Column, bVals: Column): Column = {
    val br = org.apache.spark.sql.graftbridge.ExpressionBridge
    br.column(SparseDotMicros(
      br.expression(aKeys), br.expression(aVals),
      br.expression(bKeys), br.expression(bVals)))
  }
}
