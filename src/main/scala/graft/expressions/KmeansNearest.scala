package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Nearest-centroid assignment for integer k-means
  * ([[graft.llmops.Cluster.kmeansInt]]): exact BIGINT squared-L2
  * distance of a quantized vector to each of k centroids, returning
  * [best_dist, best_cid] with the (dist, cid) lexicographic tie-break.
  *
  * Why an Expression and not Column algebra: the composed form (k
  * inlined literal-centroid sums of 64 squared differences under an
  * array_min of structs) builds a ~4k-node Catalyst tree whose
  * analysis + Janino compilation re-runs EVERY Lloyd iteration
  * (fresh literals → fresh source → no codegen reuse; measured 10+ s
  * for 3 iterations over 2k vectors — pure fixed overhead). Here the
  * centroid matrix is a REFERENCE OBJECT: the generated source is
  * identical across iterations (only `references[i]` contents change),
  * so codegen compiles once and the kernel is a tight JIT'd loop.
  * Same trade as the PQ codebook: driver-held k×dim state, bounded by
  * k, never by data.
  */
case class KmeansNearest(child: Expression, cids: Array[Long],
    cents: Array[Array[Long]]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmeans_nearest"

  override protected def nullSafeEval(input: Any): Any =
    KmeansNearest.compute(input.asInstanceOf[ArrayData], cids, cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("kmCids", cids, "long[]")
    val centsRef = ctx.addReferenceObj("kmCents", cents, "long[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.KmeansNearest.compute($c, $cidsRef, $centsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KmeansNearest {

  /** Java-callable kernel (referenced from generated code). */
  def compute(qe: ArrayData, cids: Array[Long],
      cents: Array[Array[Long]]): ArrayData = {
    var bd = Long.MaxValue
    var bc = Long.MaxValue
    var k = 0
    while (k < cents.length) {
      val c = cents(k)
      var d = 0L
      var j = 0
      while (j < c.length) {
        val t = qe.getLong(j) - c(j)
        d += t * t
        j += 1
      }
      if (d < bd || (d == bd && cids(k) < bc)) { bd = d; bc = cids(k) }
      k += 1
    }
    new GenericArrayData(Array(bd, bc))
  }

  /** Column-facing constructor. */
  def nearest(qe: Column, cids: Array[Long],
      cents: Array[Array[Long]]): Column = {
    val br = org.apache.spark.sql.graftbridge.ExpressionBridge
    br.column(KmeansNearest(br.expression(qe), cids, cents))
  }
}
