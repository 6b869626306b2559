package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst kernel for the 64-bit SimHash over a token array.
  *
  * Semantics (the cross-engine-reproducible variant): for each token t,
  * h(t) = the first 8 bytes of md5(t) as a big-endian unsigned 64-bit
  * value; bit j of the output is set iff strictly more than half of the
  * tokens have bit j of h(t) set (2·count > n — ties clear the bit,
  * the votes = 2·count − n > 0 sign convention).
  *
  * md5 (not an engine-private hash) makes the fingerprint bit-for-bit
  * reproducible by an external SQL oracle from the hex digits alone:
  * bit j = (hexdigit(16 − j/4) >> (j%4)) & 1. One digest pass per token
  * and a single int[64] counter per row replace the 64 separate
  * aggregate-HOF folds of the composed formulation (which re-walk the
  * token-hash array once per bit).
  *
  * Reference semantics mirrored: near-duplicate fingerprinting over the
  * whitespace-normalized token stream (SURVEY §2 llmops extensions;
  * cf. the in-row history ops of `fink_filters`, which this engine
  * generalizes to document dedup).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  // per-thread digest instance: MessageDigest is stateful, not thread-safe
  private val digestTL = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Java-callable kernel (referenced from generated code). */
  def compute(tokens: ArrayData): Long = {
    val md = digestTL.get()
    val cnt = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      md.update(tokens.getUTF8String(i).getBytes)
      val d = md.digest()
      // first 8 digest bytes as a big-endian u64 (== the value of the
      // first 16 hex chars of the md5 string)
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xFFL); b += 1 }
      var j = 0
      while (j < 64) {
        cnt(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (2 * cnt(j) > n) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Column-facing constructor. */
  def simhash(tokens: Column): Column =
    org.apache.spark.sql.graftbridge.ExpressionBridge.column(
      SimHash64(
        org.apache.spark.sql.graftbridge.ExpressionBridge
          .expression(tokens)))
}
