package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for the per-row MODE COUNT of a string array: returns
  * struct(n_items, top_count) — total occurrences and the count of the
  * single most frequent element.
  *
  * The dataflow alternative is explode → groupBy(row, element) →
  * groupBy(row): a corpus-sized (row_id, element) SHUFFLE for a
  * statistic whose state never leaves the row. Per-row frequency
  * counting is exactly the case where a custom expression beats the
  * relational encoding — the whole q36 repetition signal collapses to
  * a zero-exchange map stage (PlanSpec pins it).
  *
  * Elements hash by UTF8String equality — the same equality the
  * grouped aggregation would use.
  */
case class ModeCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ModeCount.outType
  override def prettyName: String = "mode_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${t.catalogString}")
  }

  override protected def nullSafeEval(arr: Any): Any =
    ModeCount.compute(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expressions.ModeCount.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ModeCount {

  val outType: StructType = StructType(Seq(
    StructField("n_items", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false)))

  /** Java-callable kernel (referenced from generated code). */
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Long](n * 2)
    var top = 0L
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val c = counts.merge(s, 1L, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    InternalRow(n.toLong, top)
  }

  /** Column-facing constructor. */
  def modeCount(arr: Column): Column = {
    val br = org.apache.spark.sql.graftbridge.ExpressionBridge
    br.column(ModeCount(br.expression(arr)))
  }
}
