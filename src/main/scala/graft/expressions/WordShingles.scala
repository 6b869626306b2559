package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst kernel for word n-shingles of a text column.
  *
  * Semantically identical to the composed formulation
  * `shinglesFromTokens(tokens(text), n)` in [[graft.llmops.Dedup]]:
  * lowercase, collapse every whitespace run to a single space, split on
  * the single space (Java `split(" ", -1)` semantics — a leading or
  * trailing separator yields an empty token, exactly like Spark's
  * `split`), and emit each run of `n` consecutive tokens joined by one
  * space; texts with fewer than `n` tokens yield the single shingle of
  * all tokens joined.
  *
  * The key observation making this a single pass: once whitespace is
  * collapsed to single spaces, every shingle is a CONTIGUOUS SUBSTRING
  * of the normalized text (from the start of token i to the end of
  * token i+n−1) — including the degenerate leading/trailing-empty-token
  * cases, where the shingle simply starts or ends at the space. So the
  * kernel builds the normalized byte buffer once, records the space
  * positions, and emits zero-copy `UTF8String` slices over that buffer
  * — no regex, no token-array materialization, no per-shingle
  * `slice`+`concat_ws` churn (the composed HOF form re-allocates an
  * array and a string per shingle; measured ~1.1–1.3 s of every
  * near-dup query at sf0.1).
  *
  * Whitespace class matches Java regex `\s` = [ \t\n\x0B\f\r] — all
  * single ASCII bytes, so the byte scan is UTF-8-safe (multi-byte
  * sequences never contain ASCII values). Lowercasing delegates to
  * `UTF8String.toLowerCase`, the same kernel Spark's `lower` uses under
  * the default UTF8_BINARY collation. Parity with the HOF form is
  * pinned by DedupSpec on the real corpus plus crafted edge cases.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {

  private def isWs(b: Byte): Boolean =
    b == ' ' || (b >= 0x09 && b <= 0x0D)

  /** Java-callable kernel (referenced from generated code). */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val src = text.toLowerCase.getBytes
    // Pass 1 fused: write the whitespace-collapsed copy and record each
    // emitted space position (= token boundary).
    val norm = new Array[Byte](src.length)
    var spaces = new Array[Int](8)
    var nSpaces = 0
    var len = 0
    var i = 0
    while (i < src.length) {
      val b = src(i)
      if (isWs(b)) {
        if (nSpaces == spaces.length)
          spaces = java.util.Arrays.copyOf(spaces, nSpaces * 2)
        spaces(nSpaces) = len
        nSpaces += 1
        norm(len) = ' '
        len += 1
        i += 1
        while (i < src.length && isWs(src(i))) i += 1
      } else {
        norm(len) = b
        len += 1
        i += 1
      }
    }
    // tokens = nSpaces + 1; shingle j spans tokens j .. j+n-1, i.e. the
    // contiguous normalized bytes [start(j), end(j+n-1))
    val nTokens = nSpaces + 1
    val k = nTokens - (n - 1)
    if (k <= 0)
      return new GenericArrayData(
        Array[Any](UTF8String.fromBytes(norm, 0, len)))
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      val start = if (j == 0) 0 else spaces(j - 1) + 1
      val end = if (j + n - 1 == nTokens - 1) len else spaces(j + n - 1)
      out(j) = UTF8String.fromBytes(norm, start, end - start)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column-facing constructor. */
  def shingles(text: Column, n: Int = 3): Column = {
    val br = org.apache.spark.sql.graftbridge.ExpressionBridge
    br.column(WordShingles(br.expression(text), n))
  }
}
