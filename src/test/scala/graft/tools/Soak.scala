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
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
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

    // temporal operators at 10× events (user_id offset per copy: 10×
    // the keys, same per-key density — the scale axis that matters for
    // the single user-key exchange). Materialized as a parquet dir so
    // the REAL query mains run unmodified against it.
    // temp dirs are also removed by shutdown hook so a mid-soak failure
    // (OOM, executor loss) cannot leak multi-hundred-MB copies in /tmp
    def tempDir(prefix: String): String = {
      val d = java.nio.file.Files.createTempDirectory(prefix)
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        org.apache.commons.io.FileUtils.deleteQuietly(d.toFile): Unit))
      d.toString
    }
    val ev0 = graft.operators.CoreQueries.events(spark, "/root/testdata/sf0.1")
    val soakDir = tempDir("graft_soak_events")
    (0 until 10).map { k =>
      ev0.select((col("event_id") + lit(k * 100000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(k * 10000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$soakDir/events.parquet")
    println("soak events: " +
      spark.read.parquet(s"$soakDir/events.parquet").count())
    def onBig(name: String)(f: => org.apache.spark.sql.DataFrame): Unit =
      time(name) {
        f.write.format("noop").mode("overwrite").save()
      }
    onBig("q35 as-of 10x") {
      graft.operators.EventQueries.q35AsofAttribution(spark, soakDir) }
    onBig("q38 sessionize 10x") {
      graft.operators.EventQueries.q38Sessionize(spark, soakDir) }
    onBig("q44 interval join 10x") {
      graft.operators.EventQueries.q44IntervalJoin(spark, soakDir) }
    onBig("q48 funnel 10x") {
      graft.operators.EventQueries.q48SessionFunnel(spark, soakDir) }
    onBig("q52 retention 10x") {
      graft.operators.EventQueries.q52RetentionCohorts(spark, soakDir) }
    onBig("q66 streaks 10x") {
      graft.operators.EventQueries.q66Streaks(spark, soakDir) }
    onBig("q70 incremental rollup 10x") {
      graft.operators.EventQueries.q70IncrementalRollup(spark, soakDir) }

    // triangle counting at 10× vertices: id-shifted lineitem copies
    // give 10 disjoint co-supply graphs — the vertex axis scales, the
    // per-graph density (the wedge fan-out driver) stays fixed
    {
      val li0 = graft.operators.CoreQueries
        .table(spark, "/root/testdata/sf0.1", "lineitem")
        .select("l_partkey", "l_suppkey")
      val bigLi = (0 until 10).map { k =>
        li0.select((col("l_partkey") + lit(k * 10000000L)).as("l_partkey"),
          (col("l_suppkey") + lit(k * 1000000L)).as("l_suppkey"))
      }.reduce(_ unionByName _)
      val liDir = tempDir("graft_soak_li")
      try {
        bigLi.withColumn("l_orderkey", lit(0L))
          .withColumn("l_linenumber", lit(1))
          .withColumn("l_quantity", lit(1.0))
          .withColumn("l_extendedprice", lit(1.0))
          .withColumn("l_discount", lit(0.0))
          .withColumn("l_tax", lit(0.0))
          .withColumn("l_returnflag", lit("N"))
          .withColumn("l_linestatus", lit("O"))
          .withColumn("l_shipdate",
            lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
          .write.mode("overwrite").parquet(s"$liDir/lineitem.parquet")
        onBig("q68 triangles 10x (10 disjoint co-supply graphs)") {
          graft.operators.GraphQueries.q68Triangles(spark, liDir) }
      } finally org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(liDir))
    }

    // LM scoring + bloom decontamination on the 10× document corpus
    // (write the corpus so the query mains run unmodified against it)
    val docDir = tempDir("graft_soak_docs")
    big.write.mode("overwrite").parquet(s"$docDir/documents.parquet")
    onBig("q53 bigram-LM score 10x") {
      graft.llmops.LmOps.q53LmScore(spark, docDir) }
    spark.catalog.clearCache() // release q53's persisted bigram relation
    onBig("q54 bloom decontaminate 10x") {
      graft.llmops.Curation.qBloomDecontaminate(spark, docDir) }
    // q41 on 10× docs: strata are 10× deeper, so the pair stage is
    // ~100× (the quadratic axis of all-pairs-within-stratum — the
    // SparseDotMicros merge is what keeps the constant small; at real
    // scale an LSH prefilter bounds the pair space first)
    onBig("q41 tfidf pairs 10x (~12.6M pairs)") {
      val r = graft.llmops.TextOps.qTfidfPairs(spark, docDir)
      r }
    spark.catalog.clearCache()

    // BPE training on the 10× corpus: the corpus cost is the one
    // token-frequency scan; merge rounds run on the (unchanged-size)
    // vocabulary, so 10× data ≈ the same training time after the scan
    val bpeOut = time("BPE train 10 merges 10x") {
      graft.llmops.Bpe.train(big, nMerges = 10)
    }
    println(s"BPE merges: ${bpeOut._1.size}")
    // merge-cadence soak: 100 merges must cost barely more than 10
    // (driver-local loop over the collected dict - one corpus scan)
    val bpe100 = time("BPE train 100 merges 10x") {
      graft.llmops.Bpe.train(big, nMerges = 100)
    }
    println(s"BPE merges: ${bpe100._1.size}")
    // KLL quantile profiles over 10× events (per type + merged form)
    locally {
      val ev10 = spark.read.parquet(s"$soakDir/events.parquet")
        .filter(col("value").isNotNull)
      time("KLL per-type sketches 10x (1M events)") {
        graft.llmops.Sketches.kllPerKey(ev10, "event_type", "value")
          .collect()
      }
    }

    // PQ training at 10× vectors: each Lloyd pass is one distributed
    // job; the codebook stays driver-sized
    {
      val e0 = spark.read
        .parquet("/root/testdata/sf0.1/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val bigE = (0 until 10).map { k =>
        e0.select((col("vec_id") + lit(k * 1000000L)).as("vec_id"),
          col("embedding"))
      }.reduce(_ unionByName _)
      time("PQ train 10x (50k vecs, 3 iters)") {
        graft.llmops.Pq.train(bigE, "embedding", dim = 64, iters = 3)
      }
    }
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(docDir))
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(soakDir))
    spark.stop()
  }
}
