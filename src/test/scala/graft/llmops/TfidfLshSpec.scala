package graft.llmops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The q41 sign-LSH prefilter must be invisible in the result: the
  * banded candidate path and the exact all-pairs path return the SAME
  * top-20 on the gate fixtures (the DuckDB oracle mirrors the exact
  * path, so this equality is what keeps the hash gate meaningful —
  * green certifies measured recall, not LSH-vs-LSH tautology).
  */
class TfidfLshSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"q41 LSH path == exact all-pairs path at $sf") {
      val dir = s"/root/testdata/$sf"
      assert(rows(TextOps.qTfidfPairs(spark, dir)) ===
        rows(TextOps.qTfidfPairsExact(spark, dir)))
    }
  }

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"q41 recall margin ≥ 2 table collisions over the top-25 at $sf") {
      // the robustness contract behind the equality above: every true
      // top-25 pair (5 ranks of headroom past the top-20 cutoff) must
      // collide in ≥ 2 of the band tables, so losing any single
      // collision to a tuning/kernel change cannot silently flip the
      // gate (Q41_MARGINS.md records the measured history)
      val margins = TextOps
        .q41CollisionMargins(spark, s"/root/testdata/$sf", 25)
        .collect().map(_.getInt(3))
      assert(margins.length === 25)
      assert(margins.min >= 2, s"margins=${margins.toSeq}")
    }
  }

  test("identical vectors always collide (certain recall for exact dups)") {
    import spark.implicits._
    val ks = Array(3L, 99L, -7L)
    val vs = Array(1000000L, 250000L, 4400000L)
    val df = Seq((ks, vs), (ks, vs)).toDF("ks", "vs")
      .select(graft.expressions.SignBands.signBands(
        col("ks"), col("vs"), 12, 48).as("bands"))
    val out = df.collect().map(_.getSeq[Int](0))
    assert(out(0) === out(1))
    assert(out(0).length === 48)
  }

  test("sign bands are deterministic and sensitive to the weights") {
    import spark.implicits._
    val ks = Array(3L, 99L, -7L)
    val df = Seq(
      (ks, Array(1000000L, 250000L, 4400000L)),
      (ks, Array(4400000L, 250000L, 1000000L))).toDF("ks", "vs")
      .select(graft.expressions.SignBands.signBands(
        col("ks"), col("vs"), 12, 48).as("bands"))
    val out = df.collect().map(_.getSeq[Int](0))
    // opposite-skewed weights over the same terms land in different
    // bands for at least one table (projections flip on some plane)
    assert(out(0) !== out(1))
    // every band key fits its 12 bits
    assert(out.flatten.forall(b => b >= 0 && b < (1 << 12)))
  }
}
