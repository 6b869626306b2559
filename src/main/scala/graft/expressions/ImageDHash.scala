package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}
import org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes

/** Native Catalyst kernel for the 64-bit perceptual difference hash
  * (dHash) of a grayscale raster — the content-level image fingerprint
  * of multimodal dedup (a training-data pipeline dedups images by what
  * they LOOK like, not by payload bytes; cf. the byte/metadata features
  * of [[graft.llmops.Multimodal]]).
  *
  * Semantics (the standard dHash construction): area-average the
  * row-major `w`×`h` raster onto a 9×8 grid, then set bit `r·8 + c`
  * iff grid(r, c) < grid(r, c+1) — 8 horizontal gradient signs per row
  * × 8 rows = 64 bits. Downsampling uses exact area weighting (a
  * target cell averages every source pixel it overlaps, weighted by
  * the overlap area), accumulated in row-major source order so the
  * value is deterministic across engines; when `w` is a multiple of 9
  * and `h` of 8 the weights are exactly 1 and the average of integer
  * pixel values is engine-exact with no float-boundary risk at all —
  * the property the q86 oracle mirror relies on.
  *
  * Near-dup blocking over the hash reuses the q24 SimHash shape
  * unchanged: 4×16-bit band keys, candidates share any band, Hamming
  * (`bit_count(xor)`) verifies — Hamming ≤ ~10 on dHash is the
  * standard perceptual near-duplicate band.
  */
case class ImageDHash(first: Expression, second: Expression,
    third: Expression)
  extends TernaryExpression with ExpectsInputTypes {

  // Seq[DataType] covariantly overrides Seq[AbstractDataType]
  // (AbstractDataType itself is private[sql])
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "image_dhash"

  override protected def nullSafeEval(px: Any, w: Any, h: Any): Any =
    ImageDHash.compute(px.asInstanceOf[ArrayData],
      w.asInstanceOf[Int], h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (px, w, h) =>
      s"graft.expressions.ImageDHash.compute($px, $w, $h)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ImageDHash {

  val GridW = 9
  val GridH = 8

  /** Java-callable kernel (referenced from generated code). */
  def compute(px: ArrayData, w: Int, h: Int): Long =
    compute(px.toDoubleArray(), w, h)

  /** Plain-array core — shared by the Catalyst expression and JVM-side
    * decoders ([[graft.llmops.Multimodal.withFitsDHash]] hashes decoded
    * FITS rasters through exactly this code path).
    */
  def compute(px: Array[Double], w: Int, h: Int): Long = {
    require(w > 0 && h > 0 && px.length == w * h,
      s"image_dhash: raster of ${px.length} pixels is not ${w}x$h")
    val cell = new Array[Double](GridW * GridH)
    var r = 0
    while (r < GridH) {
      val y0 = r.toDouble * h / GridH
      val y1 = (r + 1).toDouble * h / GridH
      var c = 0
      while (c < GridW) {
        val x0 = c.toDouble * w / GridW
        val x1 = (c + 1).toDouble * w / GridW
        var sum = 0.0
        var area = 0.0
        var y = math.floor(y0).toInt
        val yEnd = math.ceil(y1).toInt
        while (y < yEnd) {
          val wy = math.min(y + 1, y1) - math.max(y, y0)
          var x = math.floor(x0).toInt
          val xEnd = math.ceil(x1).toInt
          while (x < xEnd) {
            val wx = math.min(x + 1, x1) - math.max(x, x0)
            sum += px(y * w + x) * (wy * wx)
            area += wy * wx
            x += 1
          }
          y += 1
        }
        cell(r * GridW + c) = sum / area
        c += 1
      }
      r += 1
    }
    var out = 0L
    var b = 0
    r = 0
    while (r < GridH) {
      var c = 0
      while (c < GridW - 1) {
        if (cell(r * GridW + c) < cell(r * GridW + c + 1)) out |= (1L << b)
        b += 1
        c += 1
      }
      r += 1
    }
    out
  }

  /** Column-facing constructor: `pixels` row-major array<double>. */
  def dhash(pixels: Column, w: Column, h: Column): Column = {
    val br = org.apache.spark.sql.graftbridge.ExpressionBridge
    br.column(ImageDHash(br.expression(pixels), br.expression(w),
      br.expression(h)))
  }
}
