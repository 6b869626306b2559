package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst kernel for MOSS-style winnowing fingerprints over a
  * shingle array.
  *
  * Semantically identical to the composed formulation
  * `array_distinct(winnowFingerprints(shingleHashes(sh), w))` in
  * [[graft.llmops.TextOps]] — hash every shingle to the first 16 hex
  * chars of its md5 (so an external SQL oracle reproduces the values),
  * take the minimum of every window of `w` consecutive hashes
  * (lexicographic min of fixed-width hex == unsigned numeric min of the
  * leading 8 digest bytes), and return the distinct window minima in
  * first-occurrence order. Documents shorter than one window yield
  * their single global minimum.
  *
  * The composed version materializes the full hex-string hash array
  * plus one `slice` allocation per window; this kernel is one digest
  * pass into a long[] and an O(n·w) scan (w is small; md5 dominates),
  * emitting only the distinct minima as strings.
  */
case class WinnowFingerprints(child: Expression, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.WinnowFingerprints.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {

  private val HexChars = "0123456789abcdef".toCharArray

  private val digestTL = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Java-callable kernel (referenced from generated code). */
  def compute(shingles: ArrayData, w: Int): ArrayData = {
    val md = digestTL.get()
    val n = shingles.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      md.update(shingles.getUTF8String(i).getBytes)
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xFFL); b += 1 }
      hs(i) = v
      i += 1
    }
    // distinct window minima, first-occurrence order (w is small — the
    // O(n·w) scan is noise next to the md5 pass)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val nWin = n - (w - 1)
    if (nWin > 0) {
      i = 0
      while (i < nWin) {
        var m = hs(i)
        var j = 1
        while (j < w) {
          if (java.lang.Long.compareUnsigned(hs(i + j), m) < 0) m = hs(i + j)
          j += 1
        }
        seen.add(m)
        i += 1
      }
    } else {
      var m = hs(0)
      i = 1
      while (i < n) {
        if (java.lang.Long.compareUnsigned(hs(i), m) < 0) m = hs(i)
        i += 1
      }
      seen.add(m)
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) {
      out(i) = UTF8String.fromString(hex16(it.next()))
      i += 1
    }
    new GenericArrayData(out)
  }

  private def hex16(v: Long): String = {
    val cs = new Array[Char](16)
    var i = 0
    while (i < 16) {
      cs(i) = HexChars(((v >>> ((15 - i) * 4)) & 0xF).toInt)
      i += 1
    }
    new String(cs)
  }

  /** Column-facing constructor. */
  def winnow(shingles: Column, w: Int): Column = {
    val br = org.apache.spark.sql.graftbridge.ExpressionBridge
    br.column(WinnowFingerprints(br.expression(shingles), w))
  }
}
