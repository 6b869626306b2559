package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst kernel for the MinHash signature (SURVEY §4: the one
  * place a custom `Expression` genuinely beats composition).
  *
  * Semantically IDENTICAL to the HOF formulation in
  * [[graft.llmops.Dedup.minhash]] — for each permutation i ∈ [0, k):
  * min over shingles s of the first 16 hex chars of md5("i:" ++ s) —
  * which a DuckDB oracle reproduces bit-for-bit. The composed version
  * allocates, per (shingle, i): a concat'd UTF8String, a 32-char hex
  * string, and a substring; this kernel reuses ONE MessageDigest and
  * compares the leading 8 digest BYTES as an unsigned long (hex is
  * monotone in unsigned byte order), materializing k hex strings only
  * once per row.
  *
  * `doGenCode` emits a call to the static [[MinHashSignature.compute]]
  * helper — the expression stays inside whole-stage codegen spans
  * (standard pattern for digest-bound kernels; the md5 work dwarfs any
  * virtual-call overhead).
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.MinHashSignature.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {

  private val HexChars = "0123456789abcdef".toCharArray

  // per-thread digest instance: MessageDigest is stateful, not thread-safe
  private val digestTL = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Prefix byte arrays for "0:", "1:", … computed once per k. */
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()

  private def prefixes(k: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(k,
      _ => Array.tabulate(k)(i => s"$i:".getBytes("UTF-8")))

  /** Java-callable kernel (referenced from generated code). */
  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val md = digestTL.get()
    val pre = prefixes(k)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, -1L) // unsigned max = sentinel "no value"
    val n = shingles.numElements()
    var j = 0
    while (j < n) {
      val s = shingles.getUTF8String(j).getBytes
      var i = 0
      while (i < k) {
        md.reset()
        md.update(pre(i))
        md.update(s)
        val d = md.digest()
        // first 8 digest bytes as an unsigned big-endian long — hex-prefix
        // order and unsigned numeric order coincide
        var v = 0L
        var b = 0
        while (b < 8) { v = (v << 8) | (d(b) & 0xFFL); b += 1 }
        if (java.lang.Long.compareUnsigned(v, mins(i)) < 0) mins(i) = v
        i += 1
      }
      j += 1
    }
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      out(i) =
        if (n == 0) UTF8String.fromString("g" * 1) // parity: empty -> "g"
        else UTF8String.fromString(hex16(mins(i)))
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
  def signature(shingles: Column, k: Int): Column =
    org.apache.spark.sql.graftbridge.ExpressionBridge.column(
      MinHashSignature(
        org.apache.spark.sql.graftbridge.ExpressionBridge
          .expression(shingles), k))
}
