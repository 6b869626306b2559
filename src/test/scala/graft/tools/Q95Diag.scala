package graft.tools

import org.apache.spark.sql.SparkSession

/** DEV diagnostic: q95 end-to-end repetitions at sf0.1 (bench-shaped:
  * noop write, cache cleared between reps).
  */
object Q95Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // candidate volume with and without the PPJoin positional bound
    // (the q95 corpus shape: trigram sets + planted 70% truncations)
    {
      import org.apache.spark.sql.functions._
      val d0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val trunc = d0.filter(col("doc_id") < 200)
        .select((col("doc_id") + lit(20000L)).as("doc_id"),
          split(col("text"), " ").as("toks"))
        .select(col("doc_id"),
          array_join(slice(col("toks"), lit(1),
            greatest(lit(1),
              ((size(col("toks")) * 7).cast("double") / 10).cast("int"))),
            " ").as("text"))
      val corpus = d0.select(col("doc_id"), col("text")).unionByName(trunc)
      val sets = corpus.select(col("doc_id"),
          array_sort(array_distinct(graft.llmops.TextOps.shingleHashes(
            graft.expressions.WordShingles.shingles(col("text"), 3))))
            .as("sh"))
        .select(col("doc_id"), col("sh"),
          size(col("sh")).cast("long").as("n"))
        .localCheckpoint()
      val noPos = graft.llmops.Dedup
        .setSimCandidates(sets, 0.5, positional = false).count()
      val withPos = graft.llmops.Dedup
        .setSimCandidates(sets, 0.5, positional = true).count()
      println(s"q95 candidates sf0.1: prefix-only $noPos, " +
        f"+positional $withPos (${100.0 * (noPos - withPos) / noPos}%.1f%% cut)")
    }
    for (rep <- 1 to 3) {
      time(s"rep $rep qSetSimJoin full") {
        graft.llmops.Dedup.qSetSimJoin(spark, "/root/testdata/sf0.1")
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    for (rep <- 1 to 2) {
      time(s"rep $rep qKmeans full") {
        graft.llmops.Cluster.qKmeans(spark, "/root/testdata/sf0.1")
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
