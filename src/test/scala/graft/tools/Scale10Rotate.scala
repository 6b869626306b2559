package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Content-ROTATED 10× profile for the near-dup candidate generators:
  * unlike [[Scale10]] (verbatim replicas — the worst-case duplication
  * profile, in-bucket pairs ×100), each copy rotates its text by a
  * copy-dependent offset and flips one embedding coordinate region, so
  * copies are NOT near-dups of each other and candidate pairs scale
  * ~linearly — the realistic fresh-content scale-up. Times q28/q29 on
  * both the base and rotated-10× corpora.
  */
object Scale10Rotate {
  def main(args: Array[String]): Unit = {
    val in = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = java.nio.file.Files.createTempDirectory("sf1rot").toString
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(out)): Unit))

    val docs = spark.read.parquet(s"$in/documents.parquet")
    (0 until 10).map { k =>
      docs.select((col("doc_id") + lit(k * 100000000L)).as("doc_id"),
        // rotate: tail + head — same token statistics, different shingles
        concat(expr(s"substring(text, ${k * 37 + 1})"),
          lit(" "), expr(s"substring(text, 1, ${k * 37})")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$in/embeddings.parquet")
    (0 until 10).map { k =>
      emb.select((col("vec_id") + lit(k * 100000000L)).as("vec_id"),
        // negate a copy-dependent prefix: sign-LSH buckets diverge
        expr(s"transform(embedding, (x, i) -> " +
          s"CASE WHEN i < ${k * 3} THEN -x ELSE x END)").as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s (rows=$n)")
      spark.catalog.clearCache()
    }
    time("q28 base") {
      graft.llmops.Dedup.qDedupEmbedding(spark, in).count() }
    time("q28 rotated 10x") {
      graft.llmops.Dedup.qDedupEmbedding(spark, out).count() }
    time("q29 base") {
      graft.llmops.TextOps.qFingerprintWinnow(spark, in).count() }
    time("q29 rotated 10x") {
      graft.llmops.TextOps.qFingerprintWinnow(spark, out).count() }
    spark.stop()
  }
}
