package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst kernel for |A ∩ B| over two long-array SET columns.
  *
  * Same value as `size(array_intersect(a, b))` on distinct inputs, but
  * the builtin materializes the intersection as a fresh array (hash set
  * + growable buffer + ArrayData copy) per pair only to take its
  * length. This kernel hashes the smaller side once into an open-
  * addressing long table (power-of-two, linear probing, no boxing) and
  * counts membership hits of the larger side — the per-pair hot path
  * of every near-dup verify (`Dedup.jaccardDistinct`: |A∪B| then falls
  * out as na + nb − |A∩B| by inclusion-exclusion).
  *
  * Contract: element-distinct long arrays (the
  * [[graft.llmops.Dedup.hashedShingles]] invariant). Null slots are
  * handled with `array_intersect` set semantics (null ∈ both sides →
  * one shared member). Inputs with duplicates would count each
  * duplicate hit — garbage in, garbage out, exactly like the
  * inclusion-exclusion the caller applies.
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "intersect_count"

  // analysis-time input validation makes the SQL surface safe: without
  // it, getLong over the 4-byte slots of an int-array input returns
  // silently wrong counts instead of an error
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> inputs, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.IntersectCount.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntersectCount {

  // open-addressing sentinel: EMPTY marks an unused slot; the value
  // Long.MinValue itself is tracked by a flag so no key is unrepresentable
  private final val EMPTY = Long.MinValue

  /** Java-callable kernel (referenced from generated code). Null slots
    * follow `array_intersect` set semantics: a null element counts as
    * one shared member iff BOTH arrays contain a null (inputs are
    * element-distinct, so at most one slot per side is null).
    */
  def compute(a: ArrayData, b: ArrayData): Long = {
    // probe with the larger side so the table is built on the smaller
    val (small, big) =
      if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val n = small.numElements()
    if (n == 0) return 0L
    var cap = 8
    while (cap < n * 2) cap <<= 1 // load factor <= 0.5
    val mask = cap - 1
    val table = new Array[Long](cap)
    java.util.Arrays.fill(table, EMPTY)
    var hasEmptyKey = false
    var hasNullKey = false
    var i = 0
    while (i < n) {
      if (small.isNullAt(i)) hasNullKey = true
      else {
        val k = small.getLong(i)
        if (k == EMPTY) hasEmptyKey = true
        else {
          var idx = (java.lang.Long.hashCode(k) * 0x9E3779B9) & mask
          while (table(idx) != EMPTY && table(idx) != k)
            idx = (idx + 1) & mask
          table(idx) = k
        }
      }
      i += 1
    }
    var count = 0L
    var nullHit = false
    val m = big.numElements()
    var j = 0
    while (j < m) {
      if (big.isNullAt(j)) { if (hasNullKey && !nullHit) { count += 1; nullHit = true } }
      else {
        val k = big.getLong(j)
        if (k == EMPTY) { if (hasEmptyKey) count += 1 }
        else {
          var idx = (java.lang.Long.hashCode(k) * 0x9E3779B9) & mask
          while (table(idx) != EMPTY && table(idx) != k)
            idx = (idx + 1) & mask
          if (table(idx) == k) count += 1
        }
      }
      j += 1
    }
    count
  }

  /** Column-facing constructor. */
  def intersectCount(a: Column, b: Column): Column = {
    val br = org.apache.spark.sql.graftbridge.ExpressionBridge
    br.column(IntersectCount(br.expression(a), br.expression(b)))
  }
}
