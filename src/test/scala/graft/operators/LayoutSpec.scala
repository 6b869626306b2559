package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout: kernel correctness vs a driver-side Morton
  * reference, the LOCALITY property that justifies the layout (z-range
  * buckets have far smaller key-space bounding boxes than
  * natural-order buckets of the same size), and the writer's
  * disjoint-z-range file contract.
  */
class LayoutSpec extends SparkSpec {

  private def mortonRef(p: Long, s: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((p >> i) & 1L) << (i * 2 + 1)) | (((s >> i) & 1L) << (i * 2))
    }.sum

  test("zValue == driver Morton reference on exhaustive 6-bit pairs") {
    import spark.implicits._
    val pairs = for (p <- 0L until 64L; s <- 0L until 64L) yield (p, s)
    val got = pairs.toDF("p", "s")
      .select(col("p"), col("s"),
        Layout.zValue(Seq(col("p"), col("s")), bits = 6).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) === mortonRef(r.getLong(0), r.getLong(1), 6))
    }
    // bijection over the full 12-bit square
    assert(got.map(_.getLong(2)).distinct.length === 64 * 64)
  }

  test("scaleTo maps the domain onto [0, 2^bits) monotonically") {
    import spark.implicits._
    val vals = Seq(0L, 1L, 999L, 5000L, 9999L, 10000L)
    val got = vals.toDF("v")
      .select(Layout.scaleTo(col("v"), maxValue = 10000L, bits = 8).as("s"))
      .collect().map(_.getLong(0))
    assert(got.head === 0L)
    assert(got.last === 255L)
    assert(got.sameElements(got.sorted))
    assert(got.forall(s => s >= 0 && s < 256))
  }

  test("scaleTo is exact on extreme key domains (2^60) — no long overflow, no double rounding") {
    import spark.implicits._
    // the pre-decimal formula long-multiplied c*2^bits (overflows for
    // domains past 2^(63-bits)) then divided through DOUBLE (exact
    // only below 2^53); either silently scrambles cell assignment.
    // Pin against an exact BigInt reference across the domain.
    val bits = 16
    val max = (1L << 60) - 1
    val vals = Seq(0L, 1L, (1L << 47) + 3, max / 3, max / 2,
      max - (1L << 44) + 1, max - 1, max)
    val want = vals.map(v =>
      (BigInt(v) * (1L << bits) / (BigInt(max) + 1)).toLong)
    val got = vals.toDF("v")
      .select(Layout.scaleTo(col("v"), max, bits).as("s"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === want)
    assert(got.forall(s => s >= 0 && s < (1L << bits)))
  }

  test("locality: z-buckets bound far smaller key boxes than natural order") {
    val dir = "/root/testdata/sf0.001"
    // both dimensions span the full 0..255 cell range at this SF
    // (suppkey does not — its sf0.001 domain is ~tens)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(pmod(col("l_partkey"), lit(256L)).as("p"),
        pmod(col("l_orderkey"), lit(256L)).as("s"))
    def meanBoxArea(bucket: org.apache.spark.sql.Column): Double =
      li.withColumn("b", bucket)
        .groupBy("b")
        .agg(((max("p") - min("p") + 1) *
          (max("s") - min("s") + 1)).as("area"), count(lit(1)).as("n"))
        .agg(avg("area")).collect()(0).getDouble(0)
    val zArea = meanBoxArea(
      shiftright(Layout.zValue(Seq(col("p"), col("s")), 8), 6))
    // natural order: bucket rows by partkey alone at the same ~64-row
    // granularity — one dimension tight, the other unbounded
    val naturalArea = meanBoxArea(shiftright(col("p"), 3) * 32 + (col("s") * 0))
    assert(zArea <= 8 * 8 * 2,
      s"z buckets must cover small boxes, got mean area $zArea")
    assert(naturalArea > 4 * zArea,
      s"natural-order boxes ($naturalArea) should dwarf z boxes ($zArea)")
  }

  test("writeZOrdered: output files cover disjoint z ranges") {
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft_zorder")
    try {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      Layout.writeZOrdered(li,
        Seq((col("l_partkey"), 9999L), (col("l_suppkey"), 999L)),
        bits = 8, path = out.toString, numFiles = 8)
      val back = spark.read.parquet(out.toString)
      assert(back.count() === li.count())
      // per-file z ranges must not overlap (repartitionByRange contract)
      val z = Layout.zValue(Seq(
        Layout.scaleTo(col("l_partkey"), 9999L, 8),
        Layout.scaleTo(col("l_suppkey"), 999L, 8)), 8)
      val ranges = back
        .withColumn("f", input_file_name())
        .groupBy("f").agg(min(z).as("lo"), max(z).as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      ranges.sliding(2).foreach {
        case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
        case _ =>
      }
      assert(ranges.length > 1)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(out.toFile): Unit
    }
  }
}
