package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Sign-LSH band keys for a sparse (key, value-micros) vector — the
  * banding prefilter that bounds TF-IDF all-pairs generation (q41),
  * the sparse sibling of the dense-embedding `Similarity.lshKey`
  * (reference behavior: fink_filters has no ANN/pair search; this is
  * the training-data-pipeline extension mandated by SURVEY §2.6).
  *
  * Each of `nTables × nBits` hyperplanes is a Rademacher ±1 vector
  * over the full 2⁶⁴ key space, realized lazily per present term:
  * ONE splitmix64 mix per (term, table) yields 64 independent sign
  * bits, of which bit b is the sign for plane (table, b) — so the
  * kernel costs nTables (not nTables·nBits) mixes per term, and
  * nBits ≤ 30 < 64 bits are always available. The projection is
  * Σ v_t·sign_t — exact integer arithmetic, no floats, so band keys
  * are bit-deterministic across engines and partitionings. Bit b of
  * table t's band is (projection_b ≥ 0), packed little-endian into
  * an int.
  *
  * Two pairs colliding in ANY table's band are candidate pairs; for
  * angle θ the per-table collision probability is (1−θ/π)^nBits and
  * the miss rate (1−(1−θ/π)^nBits)^nTables — the banding trade-off.
  * Identical vectors produce identical sketches, so exact-duplicate
  * pairs (the replica-soak profile) are recalled with certainty.
  *
  * Contract: keys.length == vals.length, no null slots (produced by
  * the same array_sort(collect_list) stage that feeds
  * [[SparseDotMicros]]); key ORDER is irrelevant here (the projection
  * is a sum). Null input → null output.
  */
case class SignBands(keys: Expression, vals: Expression,
    nBits: Int, nTables: Int) extends BinaryExpression {

  require(nBits >= 1 && nBits <= 30, "nBits must fit an int band key")
  require(nTables >= 1, "need at least one band table")

  override def left: Expression = keys
  override def right: Expression = vals

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sign_bands"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> inputs, got " +
        children.map(_.dataType.catalogString).mkString(", "))
  }

  override protected def nullSafeEval(k: Any, v: Any): Any =
    SignBands.compute(k.asInstanceOf[ArrayData], v.asInstanceOf[ArrayData],
      nBits, nTables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (k, v) =>
      s"graft.expressions.SignBands.compute($k, $v, $nBits, $nTables)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(keys = newLeft, vals = newRight)
}

object SignBands {

  private final val Gold = 0x9E3779B97F4A7C15L

  /** splitmix64 finalizer — the standard public-domain integer mix
    * (Steele/Lea/Flood 2014), also used by Java's SplittableRandom.
    */
  private def mix(z0: Long): Long = {
    var z = z0 + Gold
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Java-callable kernel (referenced from generated code). */
  def compute(ak: ArrayData, av: ArrayData,
      nBits: Int, nTables: Int): ArrayData = {
    val n = ak.numElements()
    val ks = new Array[Long](n)
    val vs = new Array[Long](n)
    var i = 0
    while (i < n) {
      ks(i) = ak.getLong(i)
      vs(i) = av.getLong(i)
      i += 1
    }
    val bands = new Array[Int](nTables)
    val projs = new Array[Long](nBits)
    var t = 0
    while (t < nTables) {
      java.util.Arrays.fill(projs, 0L)
      var j = 0
      while (j < n) {
        // one mix per (term, table); its 64 bits are the Rademacher
        // signs for this table's nBits hyperplanes
        val h = mix(ks(j) ^ ((t + 1).toLong * Gold))
        val v = vs(j)
        var b = 0
        while (b < nBits) {
          if (((h >>> b) & 1L) == 0L) projs(b) += v else projs(b) -= v
          b += 1
        }
        j += 1
      }
      var band = 0
      var b = 0
      while (b < nBits) {
        if (projs(b) >= 0L) band |= (1 << b)
        b += 1
      }
      bands(t) = band
      t += 1
    }
    new GenericArrayData(bands)
  }

  /** Column-facing constructor. */
  def signBands(keys: Column, vals: Column, nBits: Int, nTables: Int): Column = {
    val br = org.apache.spark.sql.graftbridge.ExpressionBridge
    br.column(SignBands(br.expression(keys), br.expression(vals),
      nBits, nTables))
  }
}
