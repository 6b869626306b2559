package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc: q41 LSH-prefiltered path vs exact all-pairs path on an
  * arbitrary data dir (used for the 10× recall check, where the spec
  * fixtures don't reach). Prints both top-20s and PASS/FAIL.
  */
object Q41Check {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("q41check")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // JIT/page-cache warmup pass, then interleaved timed passes
    var lsh = rows(graft.llmops.TextOps.qTfidfPairs(spark, dir))
    var exact = rows(graft.llmops.TextOps.qTfidfPairsExact(spark, dir))
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      lsh = rows(graft.llmops.TextOps.qTfidfPairs(spark, dir))
      val t1 = System.nanoTime()
      exact = rows(graft.llmops.TextOps.qTfidfPairsExact(spark, dir))
      val t2 = System.nanoTime()
      println(f"pass $i: LSH ${(t1 - t0) / 1e9}%.2f s  EXACT ${(t2 - t1) / 1e9}%.2f s")
    }
    println(if (lsh == exact) "PASS: identical top-20"
            else s"FAIL:\nlsh=$lsh\nexact=$exact")
    // Recall-margin artifact: per true-top-25 pair, how many band
    // tables collide under the SHIPPED SignBands kernel (≥1 ⇒ recalled;
    // min over pairs = robustness margin of the (bits, tables) tuning).
    val margins = graft.llmops.TextOps.q41CollisionMargins(spark, dir, 25)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    margins.foreach { case (a, b, c, m) =>
      println(f"margin: ($a%5d,$b%5d) cos=$c%.6f table_collisions=$m%d")
    }
    println(s"margin: min=${margins.map(_._4).min} " +
      s"median=${margins.map(_._4).sorted.apply(margins.length / 2)} " +
      s"over top-${margins.length} at $dir")
    spark.stop()
  }
}
