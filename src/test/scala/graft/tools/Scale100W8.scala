package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100×-scale soak for the round-12 continuation wave (q130-q133) —
  * the [[Scale100W4]]/[[Scale100W6]] corpus (500k docs × 43 tokens,
  * 100k-term rare vocabulary + stopword pool, md5-derived, no RNG)
  * driving:
  *
  *  - `indexUpsert` of 10% UPDATED documents over held postings + a
  *    probe over the result (the q130 maintenance path at volume) vs
  *    the full rebuild it replaces;
  *  - `bm25fIndex` build+materialize (one-off) and `bm25fProbe`
  *    batches against the held fielded index (q131 at volume);
  *  - `bm25ShardedProbe` over 4 did-disjoint shard slices vs the
  *    single-relation probe (q133 at volume — the gather stage's
  *    overhead is the measurement);
  *  - `mmrRerank` over 100 queries × 200 candidates (4M pairwise-sim
  *    rows), k = 10 greedy rounds — the per-round driver-iteration
  *    cost at a candidate volume 16× the gate's.
  *
  * Measured (32 cores, warm): upsert itself is lazy like delete (its
  * anti-join+union rides the next probe, 0.2 s to declare): probe
  * over the upsert-maintained index 50.9 s vs full rebuild+probe
  * 63.4 s — the rebuild re-tokenizes the 90% of documents the upsert
  * never touches (the q125 lesson, update-shaped; both numbers move
  * ±20% with ambient load, the GAP is the signal). bm25f
  * build+materialize 8-16 s across runs for 21.5M fielded rows
  * (one-off; both fields' tfs ride one row, so the index is
  * postings-SIZED, not 2× — and since the map_zip_with rewrite the
  * build is ONE MAP STAGE, zero exchanges, PlanSpec-pinned: the
  * first union+groupBy cut paid a full index-sized pivot shuffle and
  * measured 36.7 s at the sf1 gate vs ~11.8 s now, q108-class);
  * bm25fProbe 22-32 s per 100-query batch — bm25ProbeTerms-class,
  * the field arithmetic adds zero joins. Sharded probe (4 shards) 51.0 s
  * vs single-relation 47.8 s per batch: ~7% gather overhead (4 window
  * re-ranks + a slim union) AFTER localCheckpointing the shared
  * invariants — unmaterialized, every shard branch re-ran the full
  * postings aggregations and the same probe measured 86.5 s (the
  * multi-consumer rule, re-learned at topology scale); the topology
  * exists for the regime where one machine cannot hold the postings
  * at all. mmrRerank k=10 over 20k candidates / 4M sims: 23.9 s,
  * ~2.4 s per greedy round — flat in k, bounded by the per-round join
  * against the held sims (rank-bounded relations throughout; nothing
  * corpus-shaped). Tiered serving (q135 at volume): champion pruning
  * keeps 2.4M of 21.5M impact rows (keepTop=24 × ~100k vocab) and
  * the tiered broker answers the 100-query batch in 3.6 s vs 64.5 s
  * for the exact probe over the full index — ~18× from the per-term
  * probe-volume ceiling, with per-query losslessness self-evidence
  * (every query filled from tier 1 on this corpus; underfull ones
  * would have fallen back). minMaxFuse of the exact+champion runs
  * 1.4 s and rankedOverlap(exact, champion) 0.8 s — run-sized, as
  * the operators' contracts require (nothing corpus-shaped).
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt 'Test/runMain graft.tools.Scale100W8'
  */
object Scale100W8 {
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
    def onBig(name: String)(f: => org.apache.spark.sql.DataFrame): Unit =
      time(name) { f.write.format("noop").mode("overwrite").save() }

    val rare = transform(sequence(lit(0), lit(39)),
      i => concat(lit("t"), substring(md5(
        (((col("doc_id") / 50).cast("long") * 40 + i) % 100000)
          .cast("string")), 1, 8)))
    val stop = transform(sequence(lit(0), lit(2)),
      i => concat(lit("the"), pmod(col("doc_id") + i, lit(10))
        .cast("string")))
    val corpus = spark.range(500000L).toDF("doc_id")
      .select(col("doc_id").as("did"),
        concat_ws(" ", concat(rare, stop)).as("text"))
      .localCheckpoint()
    val qdocs = corpus.filter(col("did") % 5000 === 0) // 100 queries
    val queries = qdocs.select(col("did").as("qid"), col("text"))
    val qTok = graft.llmops.Retrieval.queryTerms(queries).localCheckpoint()

    // ---- upsert maintenance (q130 at volume): 10% of docs arrive
    // UPDATED (one appended token); upsert vs the rebuild it replaces ----
    val postings = graft.llmops.Retrieval.postingsIndex(corpus).persist()
    time("postings build+materialize 100x (one-off)") {
      println(s"  ${postings.count()} posting rows")
    }
    val updatedDocs = corpus.filter(col("did") % 10 === 3)
      .select(col("did"), concat(col("text"), lit(" upd")).as("text"))
    val upserted = time("indexUpsert 10% of 500k docs (lazy)") {
      graft.llmops.Retrieval.indexUpsert(updatedDocs, postings).persist()
    }
    onBig("bm25Probe 100 queries over the upsert-maintained index") {
      graft.llmops.Retrieval.bm25ProbeTerms(qTok, upserted, topN = 10)
    }
    val postCorpus = corpus.select(col("did"),
      when(col("did") % 10 === 3, concat(col("text"), lit(" upd")))
        .otherwise(col("text")).as("text"))
    onBig("full rebuild + probe (what upsert replaces)") {
      graft.llmops.Retrieval.bm25ProbeTerms(qTok,
        graft.llmops.Retrieval.postingsIndex(postCorpus), topN = 10)
    }
    upserted.unpersist()

    // ---- bm25f fielded index (q131 at volume) ----
    val fielded = graft.llmops.Retrieval.bm25fIndex(corpus, titleLen = 6)
      .persist()
    time("bm25f fielded index build+materialize 100x (one-off)") {
      println(s"  ${fielded.count()} fielded rows")
    }
    onBig("bm25fProbe 100 queries over held fielded index") {
      graft.llmops.Retrieval.bm25fProbe(queries, fielded, topN = 10)
    }
    fielded.unpersist()

    // ---- scatter-gather (q133 at volume): 4 shard slices vs single ----
    val shards = (0L until 4L).map(s =>
      postings.filter(pmod(col("did"), lit(4L)) === s))
    onBig("bm25ShardedProbe 100 queries over 4 shards") {
      graft.llmops.Retrieval.bm25ShardedProbe(queries, shards, topN = 10)
    }
    onBig("bm25ProbeTerms 100 queries, single relation (reference)") {
      graft.llmops.Retrieval.bm25ProbeTerms(qTok, postings, topN = 10)
    }

    // ---- tiered serving (q135 at volume): champion tier over the
    // 100k-term vocabulary — keepTop bounds the probe to
    // |q|·keepTop postings however skewed the terms ----
    val impacts = graft.llmops.Retrieval.impactIndex(postings).persist()
    time("impact quantization 100x (one-off, per epoch)") {
      println(s"  ${impacts.count()} impact rows")
    }
    val champ = graft.llmops.Retrieval
      .prunedImpactIndex(impacts, keepTop = 24).persist()
    time("champion pruning keepTop=24 (one-off)") {
      println(s"  ${champ.count()} champion rows")
    }
    onBig("tieredImpactProbe 100 queries (tier-1 + fallback broker)") {
      graft.llmops.Retrieval.tieredImpactProbe(qTok, impacts, champ,
        topN = 10)
    }

    // ---- min-max fusion + RBO (q134/q136 at volume): both consume
    // rank-bounded runs, so their cost must be run-sized, never
    // corpus-sized — fuse/compare the exact and champion probes ----
    val runExact = graft.llmops.Retrieval
      .impactProbe(qTok, impacts, topN = 20).localCheckpoint()
    val runChamp = graft.llmops.Retrieval
      .impactProbe(qTok, champ, topN = 20).localCheckpoint()
    onBig("minMaxFuse exact(3) + champion(2) runs") {
      graft.llmops.Retrieval.minMaxFuse(Seq(
        ("exact", runExact.select(col("qid"), col("did"),
          col("bm25_micro").as("score")), 3L),
        ("champ", runChamp.select(col("qid"), col("did"),
          col("bm25_micro").as("score")), 2L)), topK = 10)
    }
    onBig("rankedOverlap(exact, champion) k=10") {
      graft.llmops.Retrieval.rankedOverlap(
        runExact.select("qid", "did", "rk"),
        runChamp.select("qid", "did", "rk"), k = 10)
    }
    impacts.unpersist(); champ.unpersist()

    // ---- MMR at volume (q132 at 16× the gate's candidate pool):
    // 100 queries × 200 candidates, 4M sim rows, k = 10 rounds ----
    val cand = spark.range(100L * 200L).toDF("i")
      .select((col("i") / 200).cast("long").as("qid"),
        pmod(col("i"), lit(200L)).as("did"),
        (conv(substring(md5(col("i").cast("string")), 1, 6), 16, 10)
          .cast("long") % 1000000L).as("rel_micro"))
      .localCheckpoint()
    val ca = cand.select(col("qid"), col("did").as("did_a"))
    val cb = cand.select(col("qid").as("qid_b"), col("did").as("did_b"))
    val sims = ca.join(cb,
        col("qid") === col("qid_b") && col("did_a") =!= col("did_b"))
      .select(col("qid"), col("did_a"), col("did_b"),
        (conv(substring(md5(concat_ws("_", col("qid"),
          least(col("did_a"), col("did_b")),
          greatest(col("did_a"), col("did_b")))), 1, 6), 16, 10)
          .cast("long") % 1000000L).as("sim_micro"))
      .localCheckpoint()
    println(s"  mmr pool: ${cand.count()} candidates, " +
      s"${sims.count()} sim rows")
    onBig("mmrRerank k=10 over 100x candidate pool") {
      graft.llmops.Retrieval.mmrRerank(cand, sims, k = 10)
    }
    spark.catalog.clearCache()
    spark.stop()
  }
}
