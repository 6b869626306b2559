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
  * Permutation family: ONE md5 per shingle, k affine rehashes —
  * h = the first 12 hex chars (48 bits) of md5(shingle), permutation i
  * is (aᵢ·(h mod M) + bᵢ) mod M with M = 2³¹−1 and seeded-deterministic
  * aᵢ ∈ [1, M), bᵢ ∈ [0, M). Every operation is exact 64-bit integer
  * arithmetic (aᵢ·h' + bᵢ < 2⁶²), so an external SQL oracle reproduces
  * the signature bit-for-bit from the md5 hex digits — and the digest
  * work per shingle drops k-fold versus hashing "i:shingle" k times
  * (the round-2 formulation). Min collisions from the 31-bit range are
  * harmless: the min stays well-defined and both engines compute the
  * same values.
  *
  * Signature entries are decimal strings (the band keys concatenate
  * them; equality of decimal strings == equality of values). Empty
  * shingle sets yield the "g" sentinel per slot (unreachable for the
  * tokenizer, which never emits an empty array).
  *
  * Semantically IDENTICAL to the HOF formulation in
  * [[graft.llmops.Dedup.minhash]], checked by DedupSpec.
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

  /** Mersenne prime 2³¹−1: the permutation modulus. aᵢ·h' + bᵢ with
    * a, b, h' < M stays under 2⁶² — exact in plain 64-bit (and ANSI
    * BIGINT) arithmetic, no 128-bit needed.
    */
  val M: Long = 2147483647L

  /** Seeded-deterministic affine coefficients — the single source of
    * truth for the Scala kernel, the HOF reference formulation, and
    * the generated oracle SQL.
    */
  def affineA(i: Int): Long = {
    val r = new scala.util.Random(9876L * (i + 1))
    1L + r.nextInt((M - 1).toInt)
  }

  def affineB(i: Int): Long = {
    val r = new scala.util.Random(54321L * (i + 1))
    r.nextInt(M.toInt).toLong
  }

  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def coeffs(k: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(k,
      _ => (Array.tabulate(k)(affineA), Array.tabulate(k)(affineB)))

  // per-thread digest instance: MessageDigest is stateful, not thread-safe
  private val digestTL = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Java-callable kernel (referenced from generated code). */
  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val md = digestTL.get()
    val (as, bs) = coeffs(k)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var j = 0
    while (j < n) {
      md.reset()
      md.update(shingles.getUTF8String(j).getBytes)
      val d = md.digest()
      // first 6 digest bytes == the value of the first 12 hex chars
      var h = 0L
      var b = 0
      while (b < 6) { h = (h << 8) | (d(b) & 0xFFL); b += 1 }
      val hm = h % M
      var i = 0
      while (i < k) {
        val v = (as(i) * hm + bs(i)) % M
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      out(i) =
        if (n == 0) UTF8String.fromString("g") // parity: empty -> "g"
        else UTF8String.fromString(java.lang.Long.toString(mins(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-facing constructor. */
  def signature(shingles: Column, k: Int): Column =
    org.apache.spark.sql.graftbridge.ExpressionBridge.column(
      MinHashSignature(
        org.apache.spark.sql.graftbridge.ExpressionBridge
          .expression(shingles), k))
}
