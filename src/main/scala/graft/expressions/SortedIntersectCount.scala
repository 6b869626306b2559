package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** |A ∩ B| of two SORTED string arrays as one merge walk — the verify
  * kernel of the exact set-similarity join
  * ([[graft.llmops.Dedup.setSimilarityJoin]]).
  *
  * Why not `size(array_intersect(a, b))`: ArrayIntersect materializes
  * the intersection ARRAY and hashes generic elements per row —
  * measured ~20 µs/row on 50-element md5-16 sets (6.3 s for one pass
  * over 325k candidate pairs at sf0.1; the whole verify was ~15 s of
  * a 22 s query). A count-only merge walk over arrays the build side
  * sorted ONCE per document is O(|A|+|B|) byte comparisons with zero
  * allocation. Exact for ANY string sets (no hash-encoding
  * assumption) as long as both inputs are sorted by Spark's binary
  * UTF8String order — [[graft.llmops.Dedup.setSimilarityJoin]] sorts
  * the per-document set once at build.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.SortedIntersectCount.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object SortedIntersectCount {

  /** Java-callable kernel (referenced from generated code). */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).binaryCompare(b.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  /** Column-facing constructor (both inputs must be array_sort'ed). */
  def of(a: Column, b: Column): Column = {
    val br = org.apache.spark.sql.graftbridge.ExpressionBridge
    br.column(SortedIntersectCount(br.expression(a), br.expression(b)))
  }
}
