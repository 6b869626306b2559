package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[ImageDHash]] pinned against an independent implementation and its
  * exact algebraic properties — no tolerance anywhere (the kernel's
  * cross-engine contract is bit-exactness).
  */
class ImageDHashSpec extends SparkSpec {

  import spark.implicits._

  /** Independent dHash: per target cell, loop over ALL source pixels
    * computing rectangle-overlap weights (a different traversal than
    * the kernel's bounded window), then the same gradient-sign bits.
    */
  private def refDHash(px: Array[Double], w: Int, h: Int): Long = {
    val cell = Array.ofDim[Double](8, 9)
    for (r <- 0 until 8; c <- 0 until 9) {
      val (y0, y1) = (r * h / 8.0, (r + 1) * h / 8.0)
      val (x0, x1) = (c * w / 9.0, (c + 1) * w / 9.0)
      var sum = 0.0
      var area = 0.0
      for (y <- 0 until h; x <- 0 until w) {
        val wy = math.max(0.0, math.min(y + 1, y1) - math.max(y, y0))
        val wx = math.max(0.0, math.min(x + 1, x1) - math.max(x, x0))
        if (wy > 0 && wx > 0) { sum += px(y * w + x) * (wy * wx); area += wy * wx }
      }
      cell(r)(c) = sum / area
    }
    (0 until 64).foldLeft(0L) { (acc, b) =>
      if (cell(b / 8)(b % 8) < cell(b / 8)(b % 8 + 1)) acc | (1L << b) else acc
    }
  }

  private def sparkDHash(px: Array[Double], w: Int, h: Int): Long =
    Seq(px.toSeq).toDF("px")
      .select(ImageDHash.dhash(col("px"), lit(w), lit(h)).as("dh"))
      .head().getLong(0)

  test("kernel == independent implementation on random rasters, " +
    "both exact-multiple and fractional-boundary dims") {
    val rnd = new scala.util.Random(11)
    for ((w, h) <- Seq((18, 16), (9, 8), (20, 13), (63, 63), (37, 8))) {
      val px = Array.fill(w * h)(rnd.nextInt(256).toDouble)
      assert(sparkDHash(px, w, h) === refDHash(px, w, h),
        s"mismatch at ${w}x$h")
    }
  }

  test("algebraic pins: constant=0, row ramp=-1, brightness-invariant") {
    // constant raster: no strict gradient anywhere -> 0
    assert(sparkDHash(Array.fill(18 * 16)(7.0), 18, 16) === 0L)
    // strictly increasing left-to-right in every row: all 64 bits set
    val ramp = Array.tabulate(18 * 16)(i => (i % 18).toDouble)
    assert(sparkDHash(ramp, 18, 16) === -1L)
    // adding a constant offset leaves every gradient sign unchanged
    val rnd = new scala.util.Random(13)
    val px = Array.fill(20 * 13)(rnd.nextInt(256).toDouble)
    assert(sparkDHash(px, 20, 13) ===
      sparkDHash(px.map(_ + 40.0), 20, 13))
  }

  test("image_dhash SQL surface == Column kernel") {
    graft.GraftExtensions.register(spark)
    val px = Array.tabulate(18 * 16)(i => ((i * 37) % 251).toDouble)
    val df = Seq(px.toSeq).toDF("px")
    df.createOrReplaceTempView("dhash_probe")
    val viaSql = spark
      .sql("SELECT image_dhash(px, 18, 16) AS dh FROM dhash_probe")
      .head().getLong(0)
    assert(viaSql === sparkDHash(px, 18, 16))
  }

  test("malformed raster fails loudly, not silently") {
    val ex = intercept[Exception] {
      Seq(Seq(1.0, 2.0)).toDF("px")
        .select(ImageDHash.dhash(col("px"), lit(18), lit(16)))
        .collect()
    }
    assert(ex.getMessage != null)
  }
}
