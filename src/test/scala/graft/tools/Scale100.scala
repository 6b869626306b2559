package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** 100× scale soak (manual): dedup/ANN batch paths on a corpus built
  * from 100 id-shifted copies of sf0.1 (500k docs / 200k vectors —
  * every doc gains 99 exact replicas, the worst-case duplication
  * profile: in-bucket candidate pairs grow ~10⁴× over sf0.1), plus
  * streaming throughput on a 1M-event / 500k-doc file replay.
  * Run with `sbt "Test/runMain graft.tools.Scale100"`.
  */
object Scale100 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tempDir(prefix: String): String = {
      val d = java.nio.file.Files.createTempDirectory(prefix)
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        org.apache.commons.io.FileUtils.deleteQuietly(d.toFile): Unit))
      d.toString
    }
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val dir100 = tempDir("graft_scale100")

    // ---- 100x corpus/vector materialization (one-off, untimed) ----
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    (0 until 100).map { k =>
      docs.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir100/documents.parquet")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    (0 until 100).map { k =>
      emb.select((col("vec_id") + lit(k * 1000000L)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir100/embeddings.parquet")
    println("scale100 docs: " +
      spark.read.parquet(s"$dir100/documents.parquet").count())
    println("scale100 vecs: " +
      spark.read.parquet(s"$dir100/embeddings.parquet").count())

    def onBig(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      time(name) { f.write.format("noop").mode("overwrite").save() }
      spark.catalog.clearCache()
    }

    // ---- batch dedup/ANN paths at 100x ----
    onBig("q23 minhash near-dup 100x") {
      graft.llmops.Dedup.qNearDupMinhash(spark, dir100) }
    // q28's GATE tuning (4 planes = 16 buckets/table) is sized for the
    // 2k-vector fixture; at 200k vectors its in-bucket pair count is
    // occupancy² ≈ (12.5k)² per bucket → ~5e9 candidate rows (measured:
    // the soak's first run sat >15 min in the candidate join). The
    // operator's scale knob is planesPer ≈ log₂(N/targetOccupancy):
    // 14 planes → 16k buckets/table, occupancy ≈ replica-group size.
    onBig("q28 embedding sign-LSH dedup 100x (14-plane buckets)") {
      graft.llmops.Dedup.embeddingDedup(
        spark.read.parquet(s"$dir100/embeddings.parquet"),
        nTables = 4, planesPer = 14, threshold = 0.3) }
    onBig("q33 dedup clusters (CC) 100x") {
      graft.llmops.Cluster.qDedupClusters(spark, dir100) }
    // semantic dedup at 200k vectors: ~2.1k every-97th seeds → cell
    // occupancy ≈ 100, so the in-cell pair stage is ~10M cosine pairs
    // (occupancy² × cells) — the knob that scales is the SEED COUNT,
    // not a hash width; at 0.9 threshold only the exact replicas
    // qualify on this corpus
    onBig("q85 semantic dedup 100x (0.9 threshold)") {
      graft.llmops.Dedup.semanticDedup(
        spark.read.parquet(s"$dir100/embeddings.parquet"),
        threshold = 0.9) }
    // perceptual dHash at 500k docs: every doc's 99 exact replicas
    // hash identically, so every band bucket holds ≥100 identical
    // members — the worst-case banding profile (pairs ≈ replica² per
    // group); the md5-token raster derivation is the scan-bound part
    onBig("q86 image dHash near-dup 100x") {
      val d = spark.read.parquet(s"$dir100/documents.parquet")
        .select(col("doc_id"),
          graft.llmops.Multimodal.tokenRaster(col("text")).as("px"),
          size(graft.expressions.WordShingles.shingles(col("text"), 1))
            .as("ntok"))
        .filter(col("ntok") > 0)
      graft.llmops.Multimodal.imageDHashPairs(
        d, "doc_id", "px", 18, 16, maxHamming = 10) }

    // semantic decontamination at 100x: 180k train / 20k eval; the
    // eval side pays nProbe x |eval| seed assignments (the small-side
    // cost) and the only shuffle is the seed_id cell join
    onBig("q90 semantic decontam 100x (180k train / 20k eval)") {
      val e = spark.read.parquet(s"$dir100/embeddings.parquet")
      graft.llmops.Curation.semanticDecontaminate(
        e.filter(col("vec_id") % 10 =!= 7),
        e.filter(col("vec_id") % 10 === 7),
        threshold = 0.3, nProbe = 2) }

    // span dedup at 500k docs: every span has >= 100 exact replicas
    // (worst-case digest skew — each window partition holds the whole
    // replica group); the shuffle carries ~9.5M (digest, doc, idx, span)
    // rows once
    onBig("q91 span dedup 100x (500k docs)") {
      graft.llmops.TextOps.spanDedup(
        spark.read.parquet(s"$dir100/documents.parquet"), 3) }

    // span INGEST: one 5k-doc replica lands against the index of the
    // other 99 (the landed side never re-chunks; per-batch cost is the
    // digest anti-join + in-batch window)
    locally {
      val all = spark.read.parquet(s"$dir100/documents.parquet")
      val landed = all.filter(col("doc_id") < 99000000L)
      val batch = all.filter(col("doc_id") >= 99000000L)
      val idx = time("span index build (495k landed docs)") {
        val i = graft.llmops.TextOps.spanIndex(landed, 3).persist()
        i.count(); i
      }
      onBig("span ingest (5k-doc batch vs landed index)") {
        graft.llmops.TextOps.spanDedupIncrement(batch, idx, 3)._1 }
      idx.unpersist()
    }

    // fuzzy join on a 200k-name vocabulary (random 8-hex names — no
    // replica shortcut: ~37 deletion variants each, 7.4M variant keys)
    onBig("q92 fuzzy join 100x (200k random names, ed<=2)") {
      val names = spark.range(200000L)
        .select(substring(md5(col("id").cast("string")), 1, 8).as("name"))
      graft.llmops.Linkage.fuzzyNamePairs(names, "name", maxDist = 2) }

    // z-order layout write of the sf0.1 fact (600k rows -> 32 files,
    // each covering a small (partkey, orderkey) rectangle)
    time("z-order write sf0.1 lineitem (600k rows, 32 files)") {
      graft.operators.Layout.writeZOrdered(
        spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet"),
        Seq((col("l_partkey"), 19999L), (col("l_orderkey"), 599999L)),
        bits = 12, path = s"$dir100/zorder_lineitem", numFiles = 32)
    }

    // IVF-PQ search over the 200k-vector corpus: index build timed
    // separately from the per-query probe (the recurring cost)
    locally {
      val e = spark.read.parquet(s"$dir100/embeddings.parquet")
        .withColumn("nrm", graft.llmops.Similarity.norm(col("embedding")))
        .persist()
      val seeds = graft.llmops.Similarity.ivfSeeds(e)
      val assign = time("ivf assign 100x (200k vecs)") {
        val a = graft.llmops.Similarity.ivfAssign(e, seeds).persist()
        a.count(); a
      }
      val (cb, _) = time("pq train 100x (3 iters)") {
        graft.llmops.Pq.train(e, "embedding", dim = 64, iters = 3)
      }
      val codes = time("pq encode 200k") {
        val c = graft.llmops.Pq.encode(e, "embedding", cb).persist()
        c.count(); c
      }
      val q = emb.filter(col("vec_id") === 0)
        .head().getSeq[Float](1).map(_.toDouble).toArray
      val qvec = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"), col("nrm").as("qn"))
      val probe = qvec.crossJoin(broadcast(seeds))
        .withColumn("cs", round(graft.llmops.Similarity.cosineWithNorms(
          col("qe"), col("semb"), col("qn"), col("snrm")), 6))
        .orderBy(col("cs").desc, col("seed_id"))
        .limit(2).select("seed_id")
      val hits = time("ivfPqSearch top-10 (2-cell probe)") {
        graft.llmops.Pq.ivfPqSearch(e, "embedding", codes, assign,
          probe, q, cb).collect()
      }
      println(s"ivfPqSearch hits: ${hits.map(_.getLong(0)).mkString(",")}")
      spark.catalog.clearCache()
    }

    // ---- streaming throughput on file replays ----
    // 1M events through the incremental-rollup sink (exactly-once
    // per-batch partial overwrite), AvailableNow over ~8-file batches
    val evDir = tempDir("graft_scale100_events")
    val ev = graft.operators.CoreQueries.events(spark, "/root/testdata/sf0.1")
    (0 until 10).map { k =>
      ev.select((col("event_id") + lit(k * 100000000L)).as("event_id"),
        col("ts"), (col("user_id") + lit(k * 10000L)).as("user_id"),
        col("event_type"), col("value"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$evDir/events")
    val nEv = spark.read.parquet(s"$evDir/events").count()
    locally {
      val src = spark.readStream
        .schema(spark.read.parquet(s"$evDir/events").schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(s"$evDir/events")
      val t0 = System.nanoTime()
      val query = graft.streaming.StreamOps
        .rollupMaintenanceSink(src, s"$evDir/partials")
        .option("checkpointLocation", s"$evDir/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"rollupMaintenanceSink: $nEv events in $dt%.1f s = " +
        f"${nEv / dt}%.0f rows/s")
      val report = graft.streaming.StreamOps
        .readRollup(spark, s"$evDir/partials").collect()
      println(s"rollup report rows: ${report.length}")
    }

    // the 500k-doc corpus through the minhash-signature streaming
    // dedup (bounded signature state within the watermark)
    val sdDir = tempDir("graft_scale100_docstream")
    spark.read.parquet(s"$dir100/documents.parquet")
      .limit(1000000)
      .withColumn("ts",
        timestamp_micros(lit(1700000000000000L) + col("doc_id") * 1000L))
      .select("doc_id", "ts", "text")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$sdDir/docs")
    val nDocs = spark.read.parquet(s"$sdDir/docs").count()
    locally {
      val src = spark.readStream
        .schema(spark.read.parquet(s"$sdDir/docs").schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(s"$sdDir/docs")
      val t0 = System.nanoTime()
      val query = graft.streaming.StreamOps
        .nearDupStream(src, "ts")
        .writeStream.format("noop")
        .option("checkpointLocation", s"$sdDir/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"nearDupStream: $nDocs docs in $dt%.1f s = " +
        f"${nDocs / dt}%.0f rows/s")
    }

    // the same corpus through the bounded-state heavy-hitters sink
    // (merged CMS + candidate ring, parquet state per micro-batch)
    locally {
      val src = spark.readStream
        .schema(spark.read.parquet(s"$sdDir/docs").schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(s"$sdDir/docs")
      val t0 = System.nanoTime()
      val query = graft.streaming.StreamOps
        .heavyHittersSink(src, s"$sdDir/hh_state", k = 20)
        .option("checkpointLocation", s"$sdDir/hh_ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"heavyHittersSink: $nDocs docs in $dt%.1f s = " +
        f"${nDocs / dt}%.0f rows/s")
      graft.streaming.StreamOps
        .readHeavyHitters(spark, s"$sdDir/hh_state", 5).show(5, false)
    }
    spark.stop()
  }
}
