package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak (manual): the near-dup → clustering path on a corpus 10×
  * sf0.1 built by unioning ten id-shifted copies — every document gains
  * 9 exact replicas, so clusters grow ~10× and in-bucket pair counts
  * ~100×: a worst-case duplication profile for LSH banding + connected
  * components. Run with `sbt "Test/runMain graft.tools.Soak"`.
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n = base.count()
    val big = (0 until 10).map { k =>
      base.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
    println(s"soak corpus: ${n * 10} docs (10 x $n)")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val pairs = graft.llmops.Dedup.nearDupPairs(big, threshold = 0.3)
    val nPairs = time("nearDupPairs (10x, exact-dup heavy)") { pairs.count() }
    println(s"pairs: $nPairs")
    // construction is eager (localCheckpoint rounds), so time the call
    val cc = time("connectedComponents") {
      val c = graft.llmops.Cluster.connectedComponents(pairs, "doc_a", "doc_b")
      c.count() // include the final pass
      c
    }
    val nClustered = cc.count()
    val nClusters = cc.select("cluster_rep").distinct().count()
    println(s"clustered docs: $nClustered in $nClusters clusters")
    val kept = time("dedupCorpus end-to-end") {
      graft.llmops.Cluster.dedupCorpus(big, threshold = 0.3).count()
    }
    println(s"kept after dedup: $kept of ${n * 10}")
    spark.stop()
  }
}
