package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for per-row ELEMENT FREQUENCIES of a string array:
  * returns map<element, count> in first-appearance order.
  *
  * This removes the (row_id, element) aggregation shuffle from every
  * "term frequency per document" pipeline (q41/q45 TF-IDF weights,
  * q53 bigram counts): the per-doc counting state never leaves the
  * row, so the relational explode → groupBy(doc, term) encoding — a
  * corpus-sized shuffle for row-local state — collapses to a map
  * stage, and downstream `explode(map)` hands the SAME (doc, term,
  * tf) relation to the rest of the plan with the corpus-wide
  * aggregations receiving pre-combined rows. The ModeCount argument
  * (q36) generalized to the full frequency map.
  *
  * Null slots are skipped (a null element is not a term). Elements
  * hash by UTF8String equality — the same equality the grouped
  * aggregation would use.
  */
case class ElementCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "element_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${t.catalogString}")
  }

  override protected def nullSafeEval(arr: Any): Any =
    ElementCounts.compute(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.expressions.ElementCounts.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ElementCounts {

  /** Java-callable kernel (referenced from generated code). */
  def compute(arr: ArrayData): MapData = {
    val n = arr.numElements()
    val m = new java.util.LinkedHashMap[UTF8String, java.lang.Long](
      Math.max(8, n * 2), 0.5f)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val k = arr.getUTF8String(i)
        val prev = m.get(k)
        m.put(k, if (prev == null) 1L else prev.longValue() + 1L)
      }
      i += 1
    }
    val keys = new Array[Any](m.size)
    val vals = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      vals(j) = e.getValue
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  /** Column-facing constructor. */
  def elementCounts(arr: Column): Column = {
    val br = org.apache.spark.sql.graftbridge.ExpressionBridge
    br.column(ElementCounts(br.expression(arr)))
  }
}
