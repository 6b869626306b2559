package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT: Z-order (Morton) clustering. At
  * 100 TB the dominant cost of a selective multi-predicate scan is how
  * many files hold rows matching ALL predicates; sorting by one key
  * clusters one dimension and scatters the rest, while interleaving
  * the key bits clusters every dimension at once — each output file
  * covers a small hyper-rectangle of the key space, so parquet
  * min/max footer pruning skips files for predicates on ANY of the
  * z-columns (the technique behind Delta/Iceberg OPTIMIZE ZORDER).
  *
  * The z-value is built from unrolled shift/mask terms — pure integer
  * Column algebra, whole-stage-codegen'd, and replayable term-for-term
  * by an external SQL engine (the q93 gate).
  */
object Layout {

  /** Morton interleave of `cols` (each already scaled by the caller to
    * a non-negative value < 2^bits; values are masked to `bits` as a
    * guard). Bit i of column j lands at position i·d + (d−1−j), so
    * column 0 owns the most significant bit of each group — dimension
    * order is the usual "first column varies slowest within a group".
    * d·bits must fit a signed long (≤ 62).
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val d = cols.size
    require(d >= 2, "z-order needs at least two columns")
    require(d * bits <= 62, s"$d cols x $bits bits overflows a long")
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield {
      val pos = i * d + (d - 1 - j)
      // (c >> i & 1) << pos, as a sum term (bit groups are disjoint)
      (shiftright(c.cast("long"), i).bitwiseAND(lit(1L))) * lit(1L << pos)
    }
    terms.reduce(_ + _)
  }

  /** Scale a non-negative key of known domain [0, maxValue] onto
    * [0, 2^bits): the caller-supplied bound keeps the mapping a pure
    * per-row function (no data-dependent pass), which an incremental
    * writer needs — the same key must land in the same z-cell in every
    * batch.
    *
    * The scaling runs in DECIMAL(38,0): the long product c·2^bits
    * overflows for domains near 2^(63−bits), and Spark's `/` on longs
    * routes through DOUBLE (exact only below 2^53) — either would
    * silently scramble z-cell assignment on extreme key domains, and a
    * batch writer that scrambles cells differently per batch breaks
    * the incremental contract above. Decimal keeps the product exact,
    * and the floor division is made exact by subtracting the modulus
    * first — floor(a/b) = (a − a mod b)/b divides an exact multiple,
    * so Spark's scale-6 decimal-quotient rounding (which CAN cross an
    * integer boundary on a bare a/b) has nothing to round. LayoutSpec
    * pins a 2^60 domain against a BigInt reference.
    */
  def scaleTo(c: Column, maxValue: Long, bits: Int): Column = {
    require(bits >= 1 && bits <= 62, s"bits must be in [1, 62], got $bits")
    require(maxValue >= 0 && maxValue < Long.MaxValue,
      s"maxValue must be in [0, Long.MaxValue), got $maxValue")
    val m = lit(maxValue + 1)
    val prod = c.cast("decimal(38,0)") * lit(1L << bits)
    least(((prod - pmod(prod, m)) / m).cast("long"),
      lit((1L << bits) - 1))
  }

  /** Write `df` clustered by the z-order of `zcols`: range-partition on
    * the z-value (each output file covers one contiguous z range — a
    * small hyper-rectangle in key space), sort within partitions so
    * parquet row-group min/max stats are tight on every z column.
    */
  def writeZOrdered(df: DataFrame, zcols: Seq[(Column, Long)], bits: Int,
      path: String, numFiles: Int): Unit = {
    val z = zValue(zcols.map { case (c, mx) => scaleTo(c, mx, bits) }, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** q93 — the z-value kernel under the hash gate: Morton-interleave
    * the low 8 bits of (l_partkey, l_suppkey) over lineitem, then
    * profile 64-z-cell buckets (count + per-dimension bounding box).
    * The DuckDB mirror replays the identical shift/mask term sum, so
    * the match certifies the interleave bit-for-bit; the LOCALITY
    * property (z-buckets have small bounding boxes — the reason to
    * z-order at all) is pinned by LayoutSpec against a natural-order
    * bucketing of the same data.
    */
  def qZOrder(spark: SparkSession, dir: String): DataFrame = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val z = zValue(Seq(pmod(col("l_partkey"), lit(256L)),
      pmod(col("l_suppkey"), lit(256L))), bits = 8)
    li.select(col("l_partkey"), col("l_suppkey"), z.as("zval"))
      .groupBy(shiftright(col("zval"), 6).as("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min("l_partkey").as("min_part"), max("l_partkey").as("max_part"),
        min("l_suppkey").as("min_supp"), max("l_suppkey").as("max_supp"))
      .orderBy("z_bucket")
  }
}
