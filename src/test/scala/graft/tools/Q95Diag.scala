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
