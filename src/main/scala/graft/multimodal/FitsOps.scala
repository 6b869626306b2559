package graft.multimodal

import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.GZIPInputStream

/** Minimal FITS image decoding + the Kolmogorov-Smirnov statistic for
  * the hostless image stage (G8). ZTF alert stamps
  * (`cutoutScience.stampData`) are gzipped single-HDU FITS files with
  * BITPIX = −32 (big-endian float32) 63×63 grids; this decodes exactly
  * that shape with plain JVM code (no codec libraries).
  *
  * The FITS layout is public (NASA FITS standard): 2880-byte header
  * blocks of 80-char cards until an END card, then the data array
  * padded to a 2880 multiple.
  */
object FitsOps {

  /** (width, height, pixels row-major); NaN pixels preserved. */
  def decodeFloatImage(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val raw =
      if (payload.length >= 2 && (payload(0) & 0xFF) == 0x1F &&
        (payload(1) & 0xFF) == 0x8B) {
        val in = new GZIPInputStream(new ByteArrayInputStream(payload))
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } else payload

    // walk 2880-byte header blocks until the END card
    var headerEnd = 0
    var done = false
    while (!done && headerEnd + 2880 <= raw.length) {
      val block = new String(raw, headerEnd, 2880, "US-ASCII")
      headerEnd += 2880
      done = block.grouped(80).exists(_.startsWith("END"))
    }
    val header = new String(raw, 0, headerEnd, "US-ASCII")
    def intCard(key: String): Int = {
      val r = (key + """\s*=\s*(-?\d+)""").r
      r.findFirstMatchIn(header).map(_.group(1).toInt)
        .getOrElse(throw new IllegalArgumentException(s"no $key card"))
    }
    require(intCard("BITPIX") == -32, "only BITPIX=-32 (float32) supported")
    val w = intCard("NAXIS1")
    val h = intCard("NAXIS2")
    val bb = ByteBuffer.wrap(raw, headerEnd, w * h * 4)
      .order(ByteOrder.BIG_ENDIAN)
    val px = new Array[Float](w * h)
    var i = 0
    while (i < px.length) { px(i) = bb.getFloat(); i += 1 }
    (w, h, px)
  }

  /** Two-sample Kolmogorov-Smirnov statistic: sup |F1 − F2|. */
  def ksStatistic(a: Array[Double], b: Array[Double]): Double = {
    if (a.isEmpty || b.isEmpty) return Double.NaN
    val sa = a.sorted
    val sb = b.sorted
    var i = 0; var j = 0; var d = 0.0
    while (i < sa.length && j < sb.length) {
      val x = math.min(sa(i), sb(j))
      while (i < sa.length && sa(i) <= x) i += 1
      while (j < sb.length && sb(j) <= x) j += 1
      d = math.max(d,
        math.abs(i.toDouble / sa.length - j.toDouble / sb.length))
    }
    d
  }

  /** Hostlessness statistic of one stamp: KS between the pixel
    * distribution of a central disc (radius `radiusPx` around the
    * candidate position, which ZTF centers in the stamp) and the outer
    * annulus. A resolved host under the transient drags the central
    * distribution away from the background → large KS; a hostless
    * transient's surroundings match the background → small KS.
    *
    * NOTE: faithful IN SHAPE to the ELEPHANT template statistic the
    * reference thresholds (`filter_new_hostless/utils.py:139-141`
    * consumes precomputed [0,0.5]/[0,0.85] score bounds); the exact
    * ELEPHANT kernel lives in fink-science, outside this checkout, so
    * the statistic here is this engine's own documented variant.
    */
  def hostlessKs(payload: Array[Byte], radiusPx: Int = 7): Double = {
    val (w, h, px) = decodeFloatImage(payload)
    val cx = (w - 1) / 2.0
    val cy = (h - 1) / 2.0
    val r2 = radiusPx.toDouble * radiusPx
    val center = Array.newBuilder[Double]
    val outer = Array.newBuilder[Double]
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = px(y * w + x)
        if (!v.isNaN) {
          val d2 = (x - cx) * (x - cx) + (y - cy) * (y - cy)
          if (d2 <= r2) center += v.toDouble else outer += v.toDouble
        }
        x += 1
      }
      y += 1
    }
    ksStatistic(center.result(), outer.result())
  }
}
