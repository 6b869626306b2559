package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100×-scale soak for the third-wave operators (q95/q96/q97) — the
  * [[Scale100]] protocol (noop writes, timed stages, WARN logs) on
  * inputs sized ~100× the sf0.1 gate fixtures. Synthetic inputs are
  * md5-derived (no RNG — reproducible across runs):
  *
  *  - q95: 200k 20-token sets where consecutive twins share 14 tokens
  *    (J = 14/26 ≈ 0.538 ≥ 0.5 — 100k planted true pairs) and
  *    non-twins share ~nothing: the rare-token profile the prefix
  *    filter is built for. The REPLICA-heavy profile (every set ×100)
  *    deliberately is NOT run through q95 raw: identical sets make
  *    every prefix token a 100-occupancy bucket and the true-pair
  *    output itself is quadratic (C(100,2) per group) — the q41
  *    lesson; production stages exact dedup (Cluster.dedupCorpus /
  *    fingerprintIndex) first, measured in [[Scale100]].
  *  - q96: 3 PageRank iterations over ~5M md5-random edges on 500k
  *    nodes (avg out-degree ~10, ~37% dangling-free — random graphs
  *    leave some sinks, exercising the redistribution path at scale).
  *  - q97: integer k-means over the 200k-vector 100× corpus, k=8,
  *    3 Lloyd iterations (assignment is the map stage, update the one
  *    shuffle — per-iteration cost is one scan + one 65-column agg).
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt 'Test/runMain graft.tools.Scale100W3'
  */
object Scale100W3 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    def onBig(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      time(name) { f.write.format("noop").mode("overwrite").save() }
      spark.catalog.clearCache()
    }

    // ---- q95 exact set-similarity join ----
    onBig("q95 set-sim join 100x (200k sets, 20 toks, twins J=.54)") {
      val shared = transform(sequence(lit(0), lit(13)),
        i => substring(md5(concat(
          ((col("doc_id") / 2).cast("long") * 1000 + i).cast("string"),
          lit("s"))), 1, 12))
      val own = transform(sequence(lit(14), lit(19)),
        i => substring(md5(concat(
          (col("doc_id") * 1000 + i).cast("string"), lit("o"))), 1, 12))
      val sets = spark.range(200000L)
        .select(col("id").as("doc_id"))
        .select(col("doc_id"),
          array_distinct(concat(shared, own)).as("sh"))
      graft.llmops.Dedup.setSimilarityJoin(sets, 0.5)
    }
    // candidate volume with/without the PPJoin positional bound (r10).
    // On THIS corpus the cut is expected ~0%: every prefix collision is
    // a planted true twin, so there is nothing for the bound to remove
    // — the measurement pins that the bound adds no overhead in the
    // all-true regime; its 60% cut shows on the real sf0.1 corpus
    // (near-threshold noise pairs), measured in tools/Q95Diag.
    locally {
      val shared = transform(sequence(lit(0), lit(13)),
        i => substring(md5(concat(
          ((col("doc_id") / 2).cast("long") * 1000 + i).cast("string"),
          lit("s"))), 1, 12))
      val own = transform(sequence(lit(14), lit(19)),
        i => substring(md5(concat(
          (col("doc_id") * 1000 + i).cast("string"), lit("o"))), 1, 12))
      val sets = spark.range(200000L)
        .select(col("id").as("doc_id"))
        .select(col("doc_id"),
          array_sort(array_distinct(concat(shared, own))).as("sh"))
        .select(col("doc_id"), col("sh"),
          size(col("sh")).cast("long").as("n"))
        .localCheckpoint()
      val noPos = time("q95 candidates 100x prefix-only") {
        graft.llmops.Dedup.setSimCandidates(sets, 0.5,
          positional = false).count()
      }
      val withPos = time("q95 candidates 100x +positional") {
        graft.llmops.Dedup.setSimCandidates(sets, 0.5,
          positional = true).count()
      }
      println(f"q95 candidates 100x: prefix-only $noPos, +positional " +
        f"$withPos (${100.0 * (noPos - withPos) / noPos}%.1f%% cut)")
      spark.catalog.clearCache()
    }

    // ---- q105 duplicated spans over the 100x replica corpus:
    // 50k docs x 10 replicas — every gram duplicated, worst-case
    // island volume (regions ≈ docs, grams all dup) ----
    onBig("q105 duplicated spans 100x (500k docs, l=8)") {
      val docs = spark.read
        .parquet("/root/testdata/sf0.1/documents.parquet")
        .select("doc_id", "text")
      val big = (0 until 10).map { k =>
        docs.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
          col("text"))
      }.reduce(_ unionByName _)
      graft.llmops.TextOps.duplicatedSpans(big, 8)
    }

    // ---- q96 integer PageRank ----
    onBig("q96 pagerank 100x (500k nodes, ~5M edges, 3 iters)") {
      val edges = spark.range(5000000L).select(
        (conv(substring(md5(col("id").cast("string")), 1, 6), 16, 10)
          .cast("long") % 500000L).as("src"),
        (conv(substring(md5(concat(col("id").cast("string"), lit("d"))),
          1, 6), 16, 10).cast("long") % 500000L).as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      graft.operators.GraphQueries.pageRankInt(edges, 3)
    }

    // ---- q97 integer k-means over the 100x vector corpus ----
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val big = (0 until 100).map { k =>
      emb.select((col("vec_id") + lit(k * 1000000L)).as("vec_id"),
        col("embedding"))
    }.reduce(_ unionByName _).localCheckpoint()
    println(s"scale100 vecs: ${big.count()}")
    onBig("q97 kmeans 100x (200k vecs, k=8, 3 iters)") {
      graft.llmops.Cluster.kmeansInt(big, k = 8, iters = 3)
    }

    // ---- q98 batch kNN join: 2k queries against the 200k corpus.
    // Index build (the one-off |corpus| x |seeds| assignment) timed
    // apart from the recurring probe+join cost, the Scale100 IVF-PQ
    // convention ----
    val withNrm = big
      .withColumn("nrm", graft.llmops.Similarity.norm(col("embedding")))
    val seeds = graft.llmops.Similarity.ivfSeeds(withNrm)
    val assign = time("q98 index build (ivfAssign 200k)") {
      val a = graft.llmops.Similarity.ivfAssign(withNrm, seeds).persist()
      a.count(); a
    }
    onBig("q98 knn join probe 100x (2k queries, k=3, prebuilt index)") {
      graft.llmops.Similarity.knnJoinIndexed(assign, seeds,
        withNrm.filter(col("vec_id") % 100L === 7L), k = 3)
    }
    assign.unpersist()

    // ---- trained-quantizer occupancy at 100x (r10): the replica
    // corpus is maximally clustered (100 exact copies per vector), so
    // modulo seeds land 100-deep in the same spots while Lloyd spreads
    // over the real density modes ----
    locally {
      def cv(seeds: org.apache.spark.sql.DataFrame): Double = {
        val counts = graft.llmops.Similarity.ivfAssign(withNrm, seeds)
          .groupBy("seed_id").count().collect()
          .map(_.getLong(1).toDouble)
        val mean = counts.sum / counts.length
        math.sqrt(counts.map(c => (c - mean) * (c - mean)).sum /
          counts.length) / mean
      }
      val tseeds = time("ivfSeedsKmeans train 100x (k=32, 2 iters)") {
        graft.llmops.Similarity.ivfSeedsKmeans(withNrm, nCells = 32,
          iters = 2)
      }
      println(f"ivf occupancy CV 100x: trained ${cv(tseeds)}%.3f")
    }

    spark.stop()
  }
}
