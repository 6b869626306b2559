package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual end-to-end drive of the public library surface (not a test —
  * run with `sbt "Test/runMain graft.tools.DriveVerify"`).
  */
object DriveVerify {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/reference/datatest/regular")

    import graft.filters.FilterRegistry
    val kn = FilterRegistry.applyFilter(df, "ztf.livestream.kn_candidates")
    kn.select("objectId", "cdsxmatch", "rf_kn_vs_nonkn").show(false)
    println("KN count: " + kn.count())

    val sn = FilterRegistry.applyFilter(df, "ztf.livestream.sn_candidates")
    println("SN count: " + sn.count())
    sn.select("objectId").explain("formatted")

    // default-bound xmatch + early-KN filters resolve by name and run
    // end-to-end against the packaged catalogs (empty for early_kn)
    for (n <- Seq("ztf.known_tde", "ztf.livestream.magnetic_cvs",
        "ztf.symbiotic_stars", "ztf.dwarf_agn",
        "ztf.livestream.early_kn_candidates"))
      println(s"$n: " + FilterRegistry.applyFilter(df, n).count())

    // stage-1+2 early-TDE pipeline end-to-end on the tde fixture
    val tde = spark.read.parquet("/root/reference/datatest/tde")
    val tdeOut = graft.filters.ztf.EarlyTdeScorer.earlyTdeCandidates(tde)
    println("early_tde_candidates (tde fixture): " + tdeOut.count() +
      " scored candidates (expect 4)")
    tdeOut.select("objectId", "tde_score").show(false)

    // trained GBT stage-2 scorer: fit on the labeled fixtures, score
    // via the compiled tree columns (no UDF in the scoring plan)
    val gbt = graft.filters.ztf.TrainedTdeScorer.train(tde, df)
    val gbtOut = graft.filters.ztf.EarlyTdeScorer
      .earlyTdeCandidates(tde, gbt)
    println("early_tde_candidates (trained GBT): " + gbtOut.count() +
      " scored candidates (expect 4)")
    gbtOut.select("objectId", "tde_score").show(false)

    try FilterRegistry.applyFilter(df, "ztf.nope")
    catch { case e: Exception =>
      println("PROBE unknown filter -> " + e.getMessage.take(130))
    }

    import graft.astro.Astro
    spark.range(1).select(
      Astro.galacticLatDeg(lit(192.85948), lit(27.12825)).as("b_at_ngp"),
      Astro.angSepDeg(lit(10.0), lit(20.0), lit(10.0), lit(21.0)).as("sep_1deg"),
      Astro.distanceModulus(lit(0.1)).as("mu_z0p1"),
      Astro.constellation(lit(101.29), lit(-16.72)).as("sirius_const")).show()

    // Rubin surface: blocks + a composite filter on the Rubin fixture
    val rdf = spark.read
      .parquet("/root/reference/datatest/rubin_test_data_10_0.parquet")
    import graft.filters.rubin.{RubinBlocks => B}
    println("Rubin good_quality: " + rdf.filter(B.goodQuality).count() +
      " (expect 7), loose extragalactic: " +
      rdf.filter(B.extragalacticLoose).count() + " (expect 4)")
    val rsample = FilterRegistry.applyFilter(rdf,
      "rubin.livestream.uniform_sample")
    println("Rubin uniform_sample: " + rsample.count() + " (expect 1)")
    rsample.select("diaSourceId").explain("formatted")

    // Rubin oracle-gate block vectors (q83/q84): the good_quality
    // column sum must reproduce the golden count, and most_likely_sn
    // must be empty on this fixture (the reference doctest pins 0)
    // while its component flags are non-trivial
    val q83 = graft.operators.GoldenQueries.q83RubinBlocks(spark, "")
    q83.agg(sum("f_good_quality"), sum("f_new"), sum("f_sso")).show()
    println("q83 rows: " + q83.count() + " (expect 27; good_quality sum 7)")
    val q84 = graft.operators.GoldenQueries
      .q84RubinMostLikelySn(spark, "")
    q84.agg(sum("f_most_likely_sn").as("sn (expect 0)"),
      sum("f_keep_transient"), sum("f_snr")).show()

    // perceptual image dHash (q86): codegen'd kernel + q24 band join
    val dh = graft.llmops.Multimodal
      .qImageDhashPairs(spark, "/root/testdata/sf0.001")
    println("image dHash near-dup pairs (sf0.001): " + dh.count() +
      " (expect 10)")

    // SemDeDup-shape semantic dedup (q85): IVF cells + in-cell cosine
    val sem = graft.llmops.Dedup
      .qSemanticDedup(spark, "/root/testdata/sf0.001")
    println("semanticDedup dropped (sf0.001): " + sem.count() +
      " (expect 346)")

    // ingest forms: batch-vs-landed pruning in embedding and
    // perceptual-hash space (landed wins, then min-id within batch)
    val embAll = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val embBatch = embAll.filter(col("vec_id") < 20)
      .select((col("vec_id") + 5000L).as("vec_id"), col("embedding"))
      .unionByName(embAll.filter(col("vec_id").between(100, 109)))
    println("semanticDedupIncrement survivors (expect 10): " +
      graft.llmops.Dedup.semanticDedupIncrement(
        embBatch, embAll.filter(col("vec_id") < 50), 0.9).count())

    // real FITS rasters through the dHash kernel core
    val fitsHashed = graft.llmops.Multimodal.withFitsDHash(
      df.select(col("candid"),
        col("cutoutScience.stampData").as("payload")), "payload")
    println("withFitsDHash non-null (expect 133): " +
      fitsHashed.filter(col("dhash").isNotNull).count())

    // llmops dedup kernels on real documents: known value for a known
    // token list (md5-based, engine-independent), plus the full near-dup
    // pipelines end-to-end
    import graft.expressions.SimHash64
    import graft.llmops.Dedup
    import spark.implicits._
    val sh = Seq(Seq("the", "quick", "brown", "fox", "the")).toDF("toks")
      .select(SimHash64.simhash(col("toks"))).head().getLong(0)
    println(s"SimHash64(known tokens): $sh (expect 1140673395500345035)")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // SQL surface injected via SparkSessionExtensions at session build
    docs.createOrReplaceTempView("docs")
    spark.sql(
      """SELECT count(DISTINCT simhash64(word_shingles(text, 1))) AS n
        |FROM docs""".stripMargin).show()
    println("minhash near-dup pairs (sf0.001): " +
      Dedup.nearDupPairs(docs, threshold = 0.3).count())
    println("simhash near-dup pairs (sf0.001): " +
      Dedup.qNearDupSimhash(spark, "/root/testdata/sf0.001").count())
    spark.catalog.clearCache()

    // round-3 operators: clustering, quality gate, temporal ops
    val sf = "/root/testdata/sf0.001"
    val cl = graft.llmops.Cluster.qDedupClusters(spark, sf)
    println("dedup clusters (sf0.001): " + cl.count() +
      " clustered docs (expect 45)")
    cl.show(5, false)
    spark.catalog.clearCache()
    graft.llmops.TextOps.qQualityFilter(spark, sf)
      .groupBy("reason").count().orderBy("reason").show(false)
    graft.llmops.TextOps.qTopTerms(spark, sf).show(5, false)
    val asof = graft.operators.EventQueries.q35AsofAttribution(spark, sf)
    println("as-of attributed purchases (sf0.001): " + asof.count() +
      " (expect 178)")
    asof.explain("formatted") // check: ONE hashpartitioning on user_id
    println("sessions (sf0.001): " +
      graft.operators.EventQueries.q38Sessionize(spark, sf).count() +
      " (expect 585)")
    graft.llmops.TextOps.qRollupProfile(spark, sf)
      .filter(col("source") === "ALL").show(false) // per-lang subtotals
    graft.operators.EventQueries.q40PivotEventMatrix(spark, sf).show(3, false)
    graft.llmops.TextOps.qTfidfPairs(spark, sf).show(3, false)
    spark.catalog.clearCache()
    graft.operators.EventQueries.q42MovingAverage(spark, sf).show(3, false)
    graft.operators.CoreQueries.q43AntiJoin(spark, sf).show(false)
    val iv = graft.operators.EventQueries.q44IntervalJoin(spark, sf)
    println("interval-join click↔purchase matches (sf0.001): " + iv.count())
    iv.explain("formatted") // check: SortMergeJoin/SHJ on (user_id, bkt),
                            // no BroadcastNestedLoopJoin anywhere
    graft.llmops.TextOps.qTopKeywords(spark, sf).show(6, false)

    // typed WLS Aggregator: grouped line fit, 5-double buffer per group
    {
      val pts = (1 to 50).map(i => graft.operators.WlsAggregator.Pt(
        i.toDouble, 2.0 * i + 1.0, 0.5))
      val fit = pts.toDS().select(graft.operators.WlsAggregator.fit).head()
      println(f"WLS aggregator fit: slope=${fit.slope}%.6f (expect 2.0), " +
        f"intercept=${fit.intercept}%.6f (expect 1.0)")
    }

    // multimodal plumbing on real ZTF cutout blobs: sniff + decode stub
    // + aspect-preserving resize in one map stage
    spark.read.parquet("/root/reference/datatest/regular")
      .select(col("cutoutScience.stampData").as("payload"))
      .select(graft.llmops.Multimodal.formatOf(col("payload")).as("fmt"),
        graft.llmops.Multimodal.resizeFit(
          graft.llmops.Multimodal.decodeImageStub(col("payload")), 256)
          .as("img"))
      .select("fmt", "img.width", "img.height", "img.scale")
      .show(3, false)

    // incremental ingest dedup: second half of the corpus lands against
    // the first half's fingerprint index
    {
      val half1 = docs.filter(col("doc_id") < 250)
      val half2 = docs.filter(col("doc_id") >= 250)
      val landed = Dedup.dedupIncrement(half2, Dedup.fingerprintIndex(half1))
      println(s"dedupIncrement: ${landed.count()} of ${half2.count()} " +
        "batch-2 docs land (rest are cross- or within-batch dups)")
    }

    // streaming near-dup ingest dedup across two real micro-batches
    {
      import java.sql.Timestamp
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(Long, Timestamp, String)]
      val q = graft.streaming.StreamOps
        .nearDupStream(in.toDF().toDF("doc_id", "ts", "text"), "ts")
        .writeStream.format("memory").queryName("dv_neardup")
        .outputMode("append").start()
      // epoch-0 timestamps would tie Spark's INITIAL watermark (0 ms)
      // and be dropped as late — use present-day event times
      val t0 = 1700000000000L
      in.addData((1L, new Timestamp(t0), "a b c d e"))
      q.processAllAvailable()
      in.addData((2L, new Timestamp(t0 + 60000), "A  B c d e"),
        (3L, new Timestamp(t0 + 120000), "something else entirely here"))
      q.processAllAvailable()
      println("nearDupStream survivors (expect ids 1,3): " +
        spark.table("dv_neardup").select("doc_id").collect()
          .map(_.getLong(0)).sorted.mkString(","))
      q.stop()
    }
    // LM-flavored corpus stats: Zipf fit + bigram-LM scoring extremes
    {
      val sf = "/root/testdata/sf0.001"
      graft.llmops.LmOps.q51ZipfFit(spark, sf).show(5, false)
      val scored = graft.llmops.LmOps.q53LmScore(spark, sf)
        .orderBy(col("avg_nll").desc)
      println("highest-surprise docs under the corpus bigram model:")
      scored.show(3, false)
      spark.catalog.clearCache()
    }

    // bloom-routed decontamination: the clean path must plan as a map
    // stage with the might_contain predicate (no join for clean rows)
    {
      val sf = "/root/testdata/sf0.001"
      val out = graft.llmops.Curation.qBloomDecontaminate(spark, sf)
      println(s"bloom decontamination survivors: ${out.count()} docs")
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        "bloom predicate missing from the physical plan")
      println("physical plan contains might_contain: true")
    }

    // corpus assembly: mixture sampling + sequence packing end-to-end
    {
      val sf = "/root/testdata/sf0.001"
      val d = spark.read.parquet(s"$sf/documents.parquet")
      val mixed = graft.llmops.Curation.sampleMixture(d)
        .select(col("doc_id"), col("epoch"),
          graft.llmops.TextOps.tokenCount(col("text")).as("n_tokens"))
      println(s"mixture: ${mixed.count()} copies from ${d.count()} docs")
      val packed = graft.llmops.Curation.packSequences(
        mixed.withColumn("doc_id",
          col("doc_id") * 100 + col("epoch")), maxTokens = 512)
      val stats = packed.groupBy("pack_id")
        .agg(sum("n_tokens").as("tot"))
        .agg(count(lit(1)).as("n_packs"),
          round(avg(col("tot") / 512.0), 3).as("mean_fill")).head()
      println(s"packed into ${stats.getLong(0)} packs of <=512 tokens, " +
        s"mean fill ${stats.getAs[Any](1)}")
    }

    // sketches: HLL distinct profile + CMS point queries
    {
      val ev = graft.operators.CoreQueries.events(spark, "/root/testdata/sf0.001")
      graft.llmops.Sketches.hllDistinctPerKey(ev, "event_type", "user_id")
        .select("event_type", "distinct_est").show(5, false)
      val cms = graft.llmops.Sketches.tokenCms(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
      println("CMS estimates: " + graft.llmops.Sketches
        .cmsEstimate(cms, Seq("row", "table", "value")).toSeq.sorted
        .map { case (t, c) => s"$t=$c" }.mkString(", "))
      val kll = graft.llmops.Sketches.kllPerKey(
        ev.filter(col("value").isNotNull), "event_type", "value")
        .collect().map(r =>
          r.getString(0) -> r.getAs[Array[Byte]]("kll")).toMap
      println("KLL p50/p99 per type: " + kll.toSeq.sortBy(_._1).map {
        case (k, b) =>
          val Seq(p50, p99) =
            graft.llmops.Sketches.kllQuantiles(b, Seq(0.5, 0.99))
          f"$k=($p50%.2f, $p99%.2f)"
      }.mkString(", "))
    }

    // temporal analytics: multi-touch attribution + quality selection
    {
      val sf = "/root/testdata/sf0.001"
      graft.operators.EventQueries.q63LinearAttribution(spark, sf).show(3, false)
      graft.llmops.Curation.qQualitySelect(spark, sf).show(5, false)
    }

    // PQ: train-encode-search on the real embeddings
    {
      val emb = spark.read
        .parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val (cb, trace) = graft.llmops.Pq.train(emb, "embedding", dim = 64,
        iters = 3)
      val codes = graft.llmops.Pq.encode(emb, "embedding", cb)
      val q0 = emb.filter(col("vec_id") === 0)
        .head().getSeq[Float](1).map(_.toDouble).toArray
      val top = graft.llmops.Pq.searchWithRerank(
        emb.filter(col("vec_id") =!= 0), "embedding",
        codes.filter(col("vec_id") =!= 0), q0, cb, topK = 5, pool = 50)
      println(s"PQ mse trace ${trace.map(m => f"$m%.4f").mkString("->")}; " +
        s"top-5 for vec 0: " +
        top.collect().map(r => s"${r.getLong(0)}").mkString(","))
    }

    // round-4 additions: streaks, set ops, triangles, ntile deciles
    {
      val sf = "/root/testdata/sf0.001"
      graft.operators.EventQueries.q66Streaks(spark, sf).show(3, false)
      graft.operators.EventQueries.q67SetOps(spark, sf).show(false)
      val tri = graft.operators.GraphQueries.q68Triangles(spark, sf)
      println(s"triangles: ${tri.count()} participating suppliers")
      tri.show(3, false)
      graft.operators.ExtraQueries.q69ValueDeciles(spark, sf).show(3, false)
      // plan check: the decile window must be hash-partitioned (no
      // single-partition global sort)
      val plan = graft.operators.ExtraQueries.q69ValueDeciles(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("hashpartitioning(o_orderpriority"),
        "q69 window is not partition-parallel")
    }

    // ZonePruneRule: a NAIVE user cross-match (no hand prune) gains
    // the |Δdec| bound automatically once extensions are registered
    {
      import org.apache.spark.sql.functions.broadcast
      val ev = spark.read
        .parquet("/root/testdata/sf0.001/events.parquet")
        .select(col("event_id"),
          (pmod(col("event_id") * 7919L, lit(3600L)) / 10.0).as("ra"),
          (pmod(col("event_id") * 104729L, lit(1200L)) / 10.0 - 60.0)
            .as("dec"))
      val cat = spark.read
        .parquet("/root/testdata/sf0.001/nation.parquet")
        .select(col("n_nationkey").as("cat_id"),
          (pmod((col("n_nationkey") + 1L) * 7919L, lit(3600L)) / 10.0)
            .as("cra"),
          (pmod((col("n_nationkey") + 1L) * 104729L, lit(1200L)) / 10.0
            - 60.0).as("cdec"))
      val naive = ev.join(broadcast(cat), graft.astro.Astro.angSepDeg(
        col("ra"), col("dec"), col("cra"), col("cdec")) < 15.0)
      val opt = naive.queryExecution.optimizedPlan.toString
      assert(opt.contains("abs(") && opt.contains("15.001"),
        s"zone prune not injected:\n$opt")
      println(s"zone-pruned naive xmatch matches: ${naive.count()} pairs")
    }

    // NOT IN null-aware anti join + salted skew join + sequence pattern
    {
      val sf = "/root/testdata/sf0.001"
      graft.operators.CoreQueries.q71NotInNullAware(spark, sf).show(3, false)
      graft.operators.Skew.q72SaltedJoin(spark, sf).show(3, false)
      graft.operators.EventQueries.q73SequencePattern(spark, sf).show(3, false)
      graft.llmops.TextOps.qBpePairs(spark, sf).show(3, false)
      val (merges, bpeVocab) = graft.llmops.Bpe.train(
        spark.read.parquet(s"$sf/documents.parquet"), nMerges = 5)
      println(s"BPE merges: ${merges.map { case (a, b) => s"$a+$b" }
        .mkString(", ")}")
      graft.llmops.Bpe.segmentStats(
        spark.read.parquet(s"$sf/documents.parquet"), bpeVocab)
        .orderBy(col("n").desc).show(3, false)
      // unigram-LM sibling: seed gate + EM training + application
      graft.llmops.Unigram.qUnigramSeed(spark, sf).show(3, false)
      val (uniPieces, uniSegs) = graft.llmops.Unigram.train(
        spark.read.parquet(s"$sf/documents.parquet"),
        vocabSize = 200, seedSize = 800, emRounds = 2)
      val nMulti = uniPieces.filter(length(col("piece")) > 1).count()
      val topPieces = uniPieces
        .orderBy(col("cnt").desc, col("piece")).limit(5).collect()
        .map(r => s"${r.getString(0)}:${r.getLong(1)}").mkString(", ")
      println(s"unigram vocab: ${uniPieces.count()} pieces " +
        s"($nMulti multi-char), top: $topPieces")
      assert(nMulti > 0, "unigram EM learned no multi-char pieces")
      val uniStats = graft.llmops.Unigram.segmentStats(
        spark.read.parquet(s"$sf/documents.parquet"), uniPieces)
      println(s"unigram segmentation: ${uniSegs.count()} dict words, " +
        s"${uniStats.count()} distinct applied pieces")
      // JL ±1 random projection: 64 → 16 dims, exact integers
      val rp = graft.llmops.Similarity.randomProject(
        spark.read.parquet(s"$sf/embeddings.parquet"))
      val rpN = rp.count()
      val rpMax = rp.agg(max(abs(col("comp")))).head().getLong(0)
      println(s"random projection: $rpN (vec, k) components, " +
        s"max |comp| = $rpMax")
      assert(rpMax < 64L * 2000000L, "component outside the micro bound")
      // k-center coreset: the greedy picks must spread — every center
      // in its own cluster, total assignment conserved
      val kc = graft.llmops.Cluster.kcenterStats(
        spark.read.parquet(s"$sf/embeddings.parquet"), k = 6).collect()
      val kcN = kc.map(_.getLong(2)).sum
      println(s"kcenter: ${kc.length} centers, $kcN points, radii " +
        kc.map(_.getLong(3)).mkString(", "))
      assert(kc.length == 6 && kc.map(_.getLong(1)).distinct.length == 6,
        "kcenter centers not distinct")
      // WordPiece: the tokenizer trio's third trainer — likelihood
      // merges, ## pieces, greedy application over the real corpus
      val (wpMerges, wpPieces, _) = graft.llmops.WordPiece.train(
        spark.read.parquet(s"$sf/documents.parquet"), nMerges = 8)
      val wpStats = graft.llmops.WordPiece.segmentStats(
        spark.read.parquet(s"$sf/documents.parquet"), wpPieces)
      val wpMulti = wpPieces.count(p => p.stripPrefix("##").length > 1)
      println(s"wordpiece: merges ${wpMerges.map { case (a, b) =>
        s"$a+$b" }.mkString(", ")}; ${wpPieces.length} pieces " +
        s"($wpMulti multi-char), ${wpStats.count()} applied")
      assert(wpMulti > 0, "wordpiece learned no multi-char pieces")
      // DSIR importance resampling: en-target selection enriches the
      // target language (the selection-quality sanity the q140 hash
      // gate can't express)
      val dsir = graft.llmops.Curation.qDsirSelect(spark, sf)
      val dsirRows = dsir.collect()
      val dsirEn = dsirRows.count(_.getString(1) == "en")
      println(s"dsir selection: ${dsirRows.length} docs, $dsirEn en, " +
        s"top score ${dsirRows.head.getLong(3)}")
      assert(dsirEn * 2 > dsirRows.length,
        s"en-target selection not en-enriched: $dsirEn/${dsirRows.length}")
      // end-to-end RAG serving composition (chunk → passage index →
      // hybrid probe → MMR → snippets) on the real fixture tables
      val ragDocs = spark.read.parquet(s"$sf/documents.parquet")
      val ragQ = ragDocs.filter(pmod(col("doc_id"), lit(100L)) === 0L)
        .select(col("doc_id").as("qid"), col("text"))
      val rag = graft.llmops.RagPipeline.prepare(
        ragDocs.filter(pmod(col("doc_id"), lit(100L)) =!= 0L)
          .select("doc_id", "text"),
        ragQ, spark.read.parquet(s"$sf/embeddings.parquet"),
        topC = 12, k = 3)
      val ragAudit = rag.audit.collect()
        .map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", ")
      println(s"rag pipeline audit: $ragAudit")
      val ragCtx = rag.contexts.count()
      val ragQn = ragQ.count()
      assert(ragCtx > 0 && ragCtx <= ragQn * 3,
        s"context count $ragCtx out of bounds for $ragQn queries")
      println(s"rag contexts: $ragCtx rows for $ragQn queries, " +
        s"with snippets: ${rag.contexts.filter(
          col("snippet").isNotNull).count()}")
      spark.catalog.clearCache() // the caller-held passage index
      graft.operators.CoreQueries.q75RecursiveCte(spark, sf).show(3, false)
      graft.operators.CoreQueries.q76VariantJson(spark, sf).show(3, false)
      graft.operators.CoreQueries.q77LateralTopN(spark, sf).show(3, false)
    }

    // nonlinear Rainbow light-curve fit (G6) over the ZTF fixture
    {
      val fits = graft.filters.ztf.EarlyTdeScorer
        .withRainbowFit(spark.read.parquet("/root/reference/datatest/regular"))
        .selectExpr("objectId", "rainbow_fit.*")
        .filter(col("converged") && col("rise_time").between(0.5, 100)
          && col("temperature").between(2000, 50000))
      fits.orderBy(col("chi2")).show(5, false)
      println(s"rainbow: ${fits.count()} physical converged fits")
    }

    // streaming heavy hitters: bounded CMS + candidate state over a
    // file replay of the document corpus (AvailableNow micro-batches)
    {
      val hhDir = java.nio.file.Files.createTempDirectory("graft_hh_drive")
      // the driver testdata is a single parquet FILE; the file stream
      // source replays a DIRECTORY, so stage a multi-file copy
      spark.read.parquet(s"$sf/documents.parquet").repartition(4)
        .write.mode("overwrite").parquet(s"$hhDir/docs")
      val src = spark.readStream
        .schema(spark.read.parquet(s"$hhDir/docs").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$hhDir/docs")
      val q = graft.streaming.StreamOps
        .heavyHittersSink(src, s"$hhDir/state", k = 10)
        .option("checkpointLocation", s"$hhDir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val hh = graft.streaming.StreamOps
        .readHeavyHitters(spark, s"$hhDir/state", k = 10)
      hh.show(10, false)
      println(s"heavy hitters tracked: ${hh.count()}")
      org.apache.commons.io.FileUtils.deleteQuietly(hhDir.toFile)
    }

    // round-9 late trio: semantic decontamination, C4 span dedup,
    // symmetric-delete fuzzy join
    {
      val sf = "/root/testdata/sf0.001"
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val decon = graft.llmops.Curation.semanticDecontaminate(
        e.filter(col("vec_id") % 10 =!= 7),
        e.filter(col("vec_id") % 10 === 7), threshold = 0.3)
      decon.show(3, false)
      println(s"semantic decontam: ${decon.count()} flagged train vectors")
      val sd = graft.llmops.TextOps.spanDedup(
        spark.read.parquet(s"$sf/documents.parquet"), 3)
      sd.show(3, false)
      val tot = sd.agg(sum("n_spans"), sum("n_kept")).collect()(0)
      println(s"span dedup: ${tot.getLong(1)}/${tot.getLong(0)} spans kept")
      val fz = graft.llmops.Linkage.fuzzyNamePairs(
        spark.read.parquet(s"$sf/part.parquet"), "p_name", maxDist = 2)
      fz.show(5, false)
      println(s"fuzzy name pairs (ed<=2): ${fz.count()}")
      // exact set-similarity join (prefix-filter blocking; q95 gate
      // plants truncations — here the raw corpus, expect few/no pairs,
      // the point is driving the operator surface end to end)
      val ss = graft.llmops.Dedup.qSetSimJoin(spark, sf)
      ss.show(5, false)
      println(s"set-similarity pairs (J>=0.5): ${ss.count()}")
      // integer PageRank over the purchased-next part graph
      val pr = graft.operators.GraphQueries.q96PageRank(spark, sf)
      pr.show(5, false)
      println(s"pagerank top-20 rows: ${pr.count()}")
      // integer Lloyd k-means over the embeddings table
      val km = graft.llmops.Cluster.qKmeans(spark, sf)
      km.show(8, false)
      println(s"kmeans clusters: ${km.count()}")
      // batch kNN join over the IVF index
      val kj = graft.llmops.Similarity.qKnnJoin(spark, sf)
      kj.show(6, false)
      println(s"knn join rows: ${kj.count()}")
      // ingest form of span dedup: second half of the corpus lands
      // against the first half's span index
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val (rep, delta) = graft.llmops.TextOps.spanDedupIncrement(
        docs.filter(col("doc_id") >= 250),
        graft.llmops.TextOps.spanIndex(docs.filter(col("doc_id") < 250), 3), 3)
      val repTot = rep.agg(sum("n_spans"), sum("n_kept")).collect()(0)
      println(s"span ingest: ${repTot.getLong(1)}/${repTot.getLong(0)} " +
        s"spans kept, ${delta.count()} new index digests")
      // z-order layout: kernel profile + clustered write
      graft.operators.Layout.qZOrder(spark, sf).show(3, false)
      val zDir = java.nio.file.Files.createTempDirectory("graft_zorder_drive")
      graft.operators.Layout.writeZOrdered(
        spark.read.parquet(s"$sf/lineitem.parquet"),
        Seq((col("l_partkey"), 9999L), (col("l_orderkey"), 99999L)),
        bits = 8, path = zDir.toString, numFiles = 8)
      println(s"z-ordered write: ${spark.read.parquet(zDir.toString).count()} rows in " +
        s"${new java.io.File(zDir.toString).listFiles().count(_.getName.endsWith(".parquet"))} files")
      org.apache.commons.io.FileUtils.deleteQuietly(zDir.toFile)
      // weighted priority sample (reproducible weighted random pick)
      graft.llmops.Curation.qPrioritySample(spark, sf).show(5, false)
      // streaming span dedup over a 2-file replay of the corpus
      val sdDir = java.nio.file.Files.createTempDirectory("graft_sd_drive")
      spark.read.parquet(s"$sf/documents.parquet").repartition(2)
        .write.mode("overwrite").parquet(s"$sdDir/docs")
      val sdSrc = spark.readStream
        .schema(spark.read.parquet(s"$sdDir/docs").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$sdDir/docs")
        .select("doc_id", "text")
      val sq = graft.streaming.StreamOps
        .spanDedupSink(sdSrc, s"$sdDir/state", 3)
        .option("checkpointLocation", s"$sdDir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      sq.awaitTermination()
      val srep = graft.streaming.StreamOps
        .readSpanReports(spark, s"$sdDir/state")
      val sagg = srep.agg(sum("n_spans"), sum("n_kept")).collect()(0)
      println(s"stream span dedup: ${srep.count()} docs, " +
        s"${sagg.getLong(1)}/${sagg.getLong(0)} spans kept, " +
        s"${graft.streaming.StreamOps.readSpanIndex(spark, s"$sdDir/state")
          .count()} index digests")
      org.apache.commons.io.FileUtils.deleteQuietly(sdDir.toFile)
      // IVF index file-replay: build on 80% of the corpus, persist the
      // index + quantizer to parquet, APPEND the held-out 20% against
      // the files, probe the grown index — the incremental-ingest path
      val ivfDir = java.nio.file.Files.createTempDirectory("graft_ivf_drive")
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
        .withColumn("nrm", graft.llmops.Similarity.norm(col("embedding")))
      val quant = graft.llmops.Similarity.ivfSeeds(emb)
      quant.write.mode("overwrite").parquet(s"$ivfDir/seeds")
      graft.llmops.Similarity.ivfAssign(
          emb.filter(pmod(col("vec_id"), lit(5)) =!= 0), quant)
        .write.mode("overwrite").parquet(s"$ivfDir/index")
      val seedsBack = spark.read.parquet(s"$ivfDir/seeds")
      val grown = graft.llmops.Similarity.ivfAppend(
        spark.read.parquet(s"$ivfDir/index"), seedsBack,
        emb.filter(pmod(col("vec_id"), lit(5)) === 0))
      grown.write.mode("overwrite").parquet(s"$ivfDir/index2")
      val idx2 = spark.read.parquet(s"$ivfDir/index2")
      val probed = graft.llmops.Similarity.knnJoinIndexed(
        idx2, seedsBack, emb.filter(col("vec_id") % 53 === 0), k = 3)
      println(s"ivf append replay: index ${idx2.count()} rows " +
        s"(= corpus ${emb.count()}), probe rows: ${probed.count()}")
      // trained-quantizer option: occupancy spread vs the modulo seeder
      val tseeds = graft.llmops.Similarity.ivfSeedsKmeans(
        emb, nCells = 6, iters = 2)
      println(s"kmeans quantizer: ${tseeds.count()} cells, assignment " +
        s"rows: ${graft.llmops.Similarity.ivfAssign(emb, tseeds).count()}")
      // streaming index maintenance: 2-file replay through ivfIndexSink
      spark.read.parquet(s"$sf/embeddings.parquet")
        .select("vec_id", "embedding").repartition(2)
        .write.mode("overwrite").parquet(s"$ivfDir/vecs")
      val vSrc = spark.readStream
        .schema(spark.read.parquet(s"$ivfDir/vecs").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$ivfDir/vecs")
      val ivfQ = graft.streaming.StreamOps
        .ivfIndexSink(vSrc, s"$ivfDir/istate")
        .option("checkpointLocation", s"$ivfDir/ickpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      ivfQ.awaitTermination()
      val (sIdx, sSeeds) = graft.streaming.StreamOps
        .readIvfIndex(spark, s"$ivfDir/istate")
      println(s"stream ivf index: ${sIdx.count()} rows, " +
        s"${sSeeds.count()} seeds, probe rows: " +
        s"${graft.llmops.Similarity.knnJoinIndexed(sIdx, sSeeds,
          sIdx.filter(col("vec_id") % 53 === 0), k = 3).count()}")
      org.apache.commons.io.FileUtils.deleteQuietly(ivfDir.toFile)
      // round-10 curation surface: chunking, mixture weights,
      // arbitrary-offset duplicated spans, the end-to-end pipeline
      val corpus = spark.read.parquet(s"$sf/documents.parquet")
      println(s"chunks 64/16: ${graft.llmops.TextOps
        .chunkDocuments(corpus.select("doc_id", "text"), 64, 16).count()}")
      graft.llmops.Curation.mixtureWeights(corpus,
        Seq("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)).show(3, false)
      println(s"duplicated spans l=8: ${graft.llmops.TextOps
        .duplicatedSpans(corpus.select("doc_id", "text"), 8).count()} regions")
      val prepped = graft.llmops.CorpusPipeline.prepare(
        corpus.select("doc_id", "text"),
        Some(corpus.filter(col("doc_id") % 10 === 7)
          .select("doc_id", "text")))
      println(s"pipeline: kept ${prepped.kept.count()}, chunks " +
        s"${prepped.chunks.count()}, dropped ${prepped.dropped.count()}")
      // hybrid RRF retrieval: fused top-10 per query, both channels
      val rrf = graft.llmops.Retrieval.qHybridRrf(spark, sf)
      println(s"hybrid rrf: ${rrf.count()} fused rows, " +
        s"both-channel rows: ${rrf.filter(
          col("in_term") === 1 && col("in_vec") === 1).count()}")
      println(s"bm25 top-10: ${graft.llmops.Retrieval.qBm25(spark, sf)
        .count()} rows")
      graft.llmops.Retrieval.qRetrievalMetrics(spark, sf).show(3, false)
      println(s"bm25 over appended index: ${graft.llmops.Retrieval
        .qBm25Indexed(spark, sf).count()} rows")
      println(s"prf expanded top-10: ${graft.llmops.Retrieval
        .qPrfExpansion(spark, sf).count()} rows")
      println(s"passage top-10: ${graft.llmops.Retrieval
        .qPassageRetrieval(spark, sf).count()} rows")
      println(s"hard negatives: ${graft.llmops.Retrieval
        .qHardNegatives(spark, sf).count()} rows")
      println(s"maxscore pruned top-10: ${graft.llmops.Retrieval
        .qBm25MaxScore(spark, sf).count()} rows")
      println(s"phrase search: ${graft.llmops.Retrieval
        .qPhraseSearch(spark, sf).count()} rows")
      println(s"proximity search: ${graft.llmops.Retrieval
        .qProximitySearch(spark, sf).count()} rows")
      // positional index build/append/probe (q117/q118) + the one-shot
      // materialization fix: proximitySearch's positions feed BOTH
      // probe branches, so its plan must read ONE checkpointed RDD
      // instead of tokenizing the corpus twice
      println(s"phrase over appended positional index: ${graft.llmops
        .Retrieval.qPhraseIndexed(spark, sf).count()} rows")
      println(s"proximity over appended positional index: ${graft.llmops
        .Retrieval.qProximityIndexed(spark, sf).count()} rows")
      locally {
        val px = graft.llmops.Retrieval.qProximitySearch(spark, sf)
        px.collect()
        val pl = px.queryExecution.executedPlan.toString
        println(s"proximity one-shot reads checkpointed positions: " +
          s"${pl.contains("Scan ExistingRDD")}, posexplode count in " +
          s"plan: ${"posexplode".r.findAllIn(pl).size}")
      }
      println(s"hybrid rrf, IVF vector channel (q119): ${graft.llmops
        .Retrieval.qHybridRrfIvf(spark, sf).count()} fused rows")
      graft.llmops.Retrieval.qPhraseSnippets(spark, sf).show(3, false)
      // ANN recall certificate by composition: brute-force top-5 is
      // the relevance set, the IVF probe is the run, retrievalMetrics
      // scores it — recall_micro IS the per-query ANN recall@5
      locally {
        import graft.llmops.{Retrieval, Similarity}
        val e = spark.read.parquet(s"$sf/embeddings.parquet")
          .withColumn("nrm", Similarity.norm(col("embedding")))
        val seeds = Similarity.ivfSeeds(e)
        val assign = Similarity.ivfAssign(e, seeds).persist()
        val qs = e.filter(col("vec_id") % 53 === 0)
        val run = Similarity.knnJoinIndexed(assign, seeds, qs, k = 5)
        val runR = run.select(col("q_id").as("qid"),
          col("nn_id").as("did"), col("rk").cast("int").as("rk"))
        val wB = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("cos6").desc, col("did"))
        val rel = e.select(col("vec_id").as("did"), col("embedding").as("ce"))
          .crossJoin(broadcast(qs.select(col("vec_id").as("qid"),
            col("embedding").as("qe"))))
          .filter(col("did") =!= col("qid"))
          .select(col("qid"), col("did"),
            round(Similarity.cosine(col("ce"), col("qe")), 6).as("cos6"))
          .withColumn("brk", row_number().over(wB))
          .filter(col("brk") <= 5).select("qid", "did")
        val m = Retrieval.retrievalMetrics(runR, rel)
        println(s"ann recall@5 (ivf vs brute): mean recall_micro = " +
          s"${m.agg(avg(col("recall_micro"))).first().getDouble(0).toLong}" +
          s" over ${m.count()} queries")
        // nDCG over the same run/relevance pair: binary grades, so
        // ndcg must sit in (0, 1] when recall > 0, exactly 0 on misses
        val nd = Retrieval.ndcg(runR, rel, k = 5)
        val ndRows = nd.collect()
        assert(ndRows.forall { r =>
          val v = r.getAs[Double]("ndcg"); v >= 0.0 && v <= 1.0
        }, "ndcg outside [0,1]")
        println(s"ann ndcg@5 (ivf vs brute): mean = " +
          f"${nd.agg(avg(col("ndcg"))).first().getDouble(0)}%.4f" +
          s" over ${ndRows.length} queries")
        spark.catalog.clearCache()
      }
      // streaming postings maintenance: 2-file replay through the sink
      val pDir = java.nio.file.Files.createTempDirectory("graft_dv_post")
      corpus.select("doc_id", "text").repartition(2)
        .write.mode("overwrite").parquet(s"$pDir/docs")
      val dSrc = spark.readStream
        .schema(spark.read.parquet(s"$pDir/docs").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$pDir/docs")
      val pQ = graft.streaming.StreamOps
        .postingsIndexSink(dSrc, s"$pDir/state")
        .option("checkpointLocation", s"$pDir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      pQ.awaitTermination()
      val pIdx = graft.streaming.StreamOps
        .readPostingsIndex(spark, s"$pDir/state")
      println(s"stream postings index: ${pIdx.count()} rows, probe " +
        s"rows: ${graft.llmops.Retrieval.bm25Probe(
          corpus.filter(col("doc_id") % 100 === 0)
            .select(col("doc_id").as("qid"), col("text")),
          pIdx, topN = 5).count()}")
      org.apache.commons.io.FileUtils.deleteQuietly(pDir.toFile)
      // streaming positional maintenance: same 2-file replay shape
      val posDir = java.nio.file.Files.createTempDirectory("graft_dv_pos")
      corpus.select("doc_id", "text").repartition(2)
        .write.mode("overwrite").parquet(s"$posDir/docs")
      val posSrc = spark.readStream
        .schema(spark.read.parquet(s"$posDir/docs").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$posDir/docs")
      val posQ = graft.streaming.StreamOps
        .positionalIndexSink(posSrc, s"$posDir/state")
        .option("checkpointLocation", s"$posDir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      posQ.awaitTermination()
      val posIdx = graft.streaming.StreamOps
        .readPositionalIndex(spark, s"$posDir/state")
      println(s"stream positional index: ${posIdx.count()} rows, " +
        s"phrase-probe rows: ${graft.llmops.Retrieval.phraseProbe(
          corpus.filter(col("doc_id") % 100 === 0)
            .select(col("doc_id").as("qid"),
              element_at(graft.expressions.WordShingles
                .shingles(col("text"), 2), 1).as("phrase")),
          posIdx, topN = 5).count()}")
      org.apache.commons.io.FileUtils.deleteQuietly(posDir.toFile)
      // gram-index family (q121/q122) + impact index (q123)
      println(s"phrase over appended gram index: ${graft.llmops
        .Retrieval.qPhraseGramIndexed(spark, sf).count()} rows")
      println(s"snippets over appended gram index: ${graft.llmops
        .Retrieval.qSnippetsGramIndexed(spark, sf).count()} rows")
      println(s"bm25 over pre-quantized impacts: ${graft.llmops
        .Retrieval.qBm25Impact(spark, sf).count()} rows")
      println(s"boolean AND+NOT retrieval: ${graft.llmops
        .Retrieval.qBooleanRetrieval(spark, sf).count()} rows")
      println(s"bm25 over delete-maintained index: ${graft.llmops
        .Retrieval.qBm25Deleted(spark, sf).count()} rows")
      println(s"bm25 over upsert-maintained index: ${graft.llmops
        .Retrieval.qBm25Upserted(spark, sf).count()} rows")
      println(s"bm25f weighted-field retrieval: ${graft.llmops
        .Retrieval.qBm25F(spark, sf).count()} rows")
      println(s"mmr diversified rerank: ${graft.llmops
        .Retrieval.qMmrDiversify(spark, sf).count()} rows")
      println(s"scatter-gather sharded bm25: ${graft.llmops
        .Retrieval.qBm25Sharded(spark, sf).count()} rows")
      println(s"min-max weighted fusion: ${graft.llmops
        .Retrieval.qMinMaxFusion(spark, sf).count()} rows")
      val tiered = graft.llmops.Retrieval.qBm25Tiered(spark, sf)
      println(s"tiered champion serving: ${tiered.count()} rows, " +
        s"tier-2 fallbacks: ${tiered.filter(col("tier") === 2).count()}")
      val rbo = graft.llmops.Retrieval.qRboRuns(spark, sf)
        .agg(avg(col("rbo_micro"))).collect()(0).getDouble(0)
      println(f"rbo(bm25, term-overlap) mean: $rbo%.0f micro")
      // streaming gram maintenance: same 2-file replay shape
      val grDir = java.nio.file.Files.createTempDirectory("graft_dv_gram")
      corpus.select("doc_id", "text").repartition(2)
        .write.mode("overwrite").parquet(s"$grDir/docs")
      val grSrc = spark.readStream
        .schema(spark.read.parquet(s"$grDir/docs").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$grDir/docs")
      val grQ = graft.streaming.StreamOps
        .gramIndexSink(grSrc, s"$grDir/state", n = 2)
        .option("checkpointLocation", s"$grDir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      grQ.awaitTermination()
      val grIdx = graft.streaming.StreamOps
        .readGramPositions(spark, s"$grDir/state")
      println(s"stream gram index: ${grIdx.count()} rows, " +
        s"gram-probe rows: ${graft.llmops.Retrieval.gramProbe(
          corpus.filter(col("doc_id") % 100 === 0)
            .select(col("doc_id").as("qid"),
              element_at(graft.expressions.WordShingles
                .shingles(col("text"), 2), 1).as("phrase")),
          grIdx, topN = 5).count()}")
      org.apache.commons.io.FileUtils.deleteQuietly(grDir.toFile)
      // collocation mining: the report is non-empty on the gate corpus
      // and every lift is positive (counts are positive by construction)
      val colls = graft.llmops.TextOps.collocations(
        corpus.select("doc_id", "text"), minCount = 5L, topK = 20)
        .collect()
      println(s"collocations: ${colls.length} pairs, top " +
        (if (colls.isEmpty) "n/a"
         else s"${colls.head.getString(0)} ${colls.head.getString(1)} " +
           s"lift_micro=${colls.head.getLong(5)}"))
      assert(colls.forall(_.getLong(5) > 0L), "non-positive lift")
      // sequence packing: starts strictly increase in doc_id order and
      // every offset sits inside the context window
      val packed = graft.llmops.TextOps.concatAndChunk(
        corpus.select("doc_id", "text"), ctxLen = 512)
        .orderBy("doc_id").collect()
      val starts = packed.map(_.getAs[Long]("start_tok"))
      assert(starts.zip(starts.tail).forall { case (a, b) => a < b },
        "start_tok must strictly increase")
      assert(packed.forall(r => r.getAs[Long]("seq_offset") >= 0L &&
        r.getAs[Long]("seq_offset") < 512L), "offset outside ctx")
      println(s"sequence packing: ${packed.length} docs into " +
        s"${packed.last.getAs[Long]("seq_id") + 1} sequences")
      // epoch shuffle over the packed sequences: a permutation (no key
      // collisions), epoch-deterministic, different across epochs
      val seqIds = spark.range(packed.last.getAs[Long]("seq_id") + 1)
        .toDF("seq_id")
      val ep1 = graft.llmops.TextOps.epochShuffle(seqIds, epoch = 1L)
        .select("seq_id").collect().map(_.getLong(0)).toSeq
      val ep2 = graft.llmops.TextOps.epochShuffle(seqIds, epoch = 2L)
        .select("seq_id").collect().map(_.getLong(0)).toSeq
      assert(ep1.sorted == ep2.sorted, "epoch orders are permutations")
      assert(ep1 != ep2, "epochs must decorrelate")
      println(s"epoch shuffle: ${ep1.length} sequences, epoch-1 head " +
        s"${ep1.take(5).mkString(",")} vs epoch-2 head " +
        s"${ep2.take(5).mkString(",")}")
      // ordered sloppy phrase over the held positions: slop widening
      // can only add documents
      val slopPosIdx = graft.llmops.Retrieval.positionalIndex(
        corpus.filter(col("doc_id") % 100 =!= 0)
          .select(col("doc_id").as("did"), col("text"))).persist()
      val slopPairs = corpus.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("qid"),
          element_at(graft.llmops.Dedup.tokens(col("text")), 1).as("tok_a"),
          element_at(graft.llmops.Dedup.tokens(col("text")), 2).as("tok_b"))
      val n0 = graft.llmops.Retrieval
        .slopPhraseProbe(slopPairs, slopPosIdx, slop = 0, topN = 10).count()
      val n2 = graft.llmops.Retrieval
        .slopPhraseProbe(slopPairs, slopPosIdx, slop = 2, topN = 10).count()
      println(s"slop phrase probe: $n0 rows at slop=0, $n2 at slop=2")
      assert(n2 >= n0, "slop widening lost documents")
      // packing ingest: landed placements are untouched, the batch
      // lands at the landed total-slot offset
      val landedPack = graft.llmops.TextOps.concatAndChunk(
        corpus.filter(col("doc_id") % 10 =!= 7).select("doc_id", "text"),
        ctxLen = 512).localCheckpoint()
      val batchPack = graft.llmops.TextOps.concatAndChunkAppend(
        corpus.filter(col("doc_id") % 10 === 7)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")),
        landedPack, ctxLen = 512)
      println(s"packing append: ${batchPack.count()} batch docs placed " +
        s"after ${landedPack.count()} landed")
      // champion-list pruning: the pruned index respects the per-term
      // ceiling and the probe still answers every query that the full
      // probe answers (pruning narrows postings, not the query set)
      val dvImpacts = graft.llmops.Retrieval.impactIndex(
        graft.llmops.Retrieval.postingsIndex(
          corpus.filter(col("doc_id") % 100 =!= 0)
            .select(col("doc_id").as("did"), col("text"))))
        .localCheckpoint()
      val dvPruned = graft.llmops.Retrieval
        .prunedImpactIndex(dvImpacts, keepTop = 8).localCheckpoint()
      val dvCeil = dvPruned.groupBy("tok").count()
        .agg(max("count")).head().getLong(0)
      assert(dvCeil <= 8L, s"champion list ceiling broken: $dvCeil")
      val dvQTok = graft.llmops.Retrieval.queryTerms(
        corpus.filter(col("doc_id") % 100 === 0)
          .select(col("doc_id").as("qid"), col("text")))
        .localCheckpoint()
      val fullQids = graft.llmops.Retrieval
        .impactProbe(dvQTok, dvImpacts, topN = 5)
        .select("qid").distinct().count()
      val prunedQids = graft.llmops.Retrieval
        .impactProbe(dvQTok, dvPruned, topN = 5)
        .select("qid").distinct().count()
      println(s"pruned impact probe: $prunedQids/$fullQids queries " +
        s"answered, per-term ceiling $dvCeil <= 8")
      assert(prunedQids == fullQids, "pruning lost whole queries")
      // QL-Dirichlet: every returned score is a positive integer
      // string (the exact-product contract) and ranks are dense
      val dvQl = graft.llmops.Retrieval.qlDirichletProbe(
        graft.llmops.Retrieval.indexedQueryTerms(
          corpus.filter(col("doc_id") % 100 === 0)
            .select(col("doc_id").as("qid"), col("text")), m = 3),
        graft.llmops.Retrieval.postingsIndex(
          corpus.filter(col("doc_id") % 100 =!= 0)
            .select(col("doc_id").as("did"), col("text"))),
        topN = 5).collect()
      assert(dvQl.nonEmpty, "QL probe returned nothing")
      assert(dvQl.forall(r => BigInt(r.getAs[String]("ql_scaled")) > 0),
        "non-positive QL score on a matching candidate set")
      println(s"QL-Dirichlet probe: ${dvQl.length} rows, sample " +
        s"ql=${dvQl.head.getAs[String]("ql_scaled")}")
      spark.catalog.clearCache() // dedupCorpus's nearDupPairs persists
    }
    spark.stop()
  }
}
