package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100×-scale soak for the ROUND-12 retrieval wave (q121-q125) — the
  * [[Scale100W4]]/[[Scale100W5]] corpus (500k docs × 43 tokens,
  * 100k-term rare vocabulary + stopword pool, md5-derived, no RNG)
  * driving:
  *
  *  - `gramIndex` build+materialize (one-off) and `gramProbe`/
  *    `snippetProbe` batches against the HELD index vs the one-shot
  *    forms — the fixed-n split whose q121/q122 certificates gate at
  *    sf0.01;
  *  - `impactIndex` quantization (one-off, epoch) and `impactProbe`
  *    batches vs `bm25ProbeTerms` over the same held postings — the
  *    probe-side arithmetic the impact split removes;
  *  - `booleanProbe` (AND + NOT) batches over the held postings;
  *  - `indexDelete` of 10% of documents + a probe over the survivors
  *    (the q125 maintenance path at volume).
  *
  * Measured (32 cores, warm): gram build+materialize 33.6 s for 21M
  * gram-position rows (one-off); gramProbe 13.2 s / snippetProbe
  * 12.4 s per 100-phrase batch vs one-shots 6.7 s / 7.2 s — on THIS
  * rare vocabulary a probe costs ~2 one-shot passes (regenerating
  * grams from 500k compact strings beats scanning 21M materialized
  * rows; the W5 finding, gram-keyed), so the split's wins here are
  * ingest (gramAppend never re-shingles landed docs) and the DENSE
  * vocabulary case, where full-n-gram selectivity is the whole game
  * (sf0.1 gate: q121 0.77 s vs the token-positional q117 1.75 s).
  * impactProbe 8.6 s vs the exact probe's 51.7 s per batch — 6×, the
  * arithmetic/join elimination the quantization buys (both pay the
  * same stopword posting fan-out). booleanProbe 7.7 s per batch.
  * indexDelete is lazy (its anti-join rides the next probe): probe
  * over survivors 49.5 s ≈ the exact probe's 51.7 s — the delete
  * itself is measurement noise.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt 'Test/runMain graft.tools.Scale100W6'
  */
object Scale100W6 {
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
    val phrases = qdocs
      .select(col("did").as("qid"),
        element_at(graft.expressions.WordShingles
          .shingles(col("text"), 2), 1).as("phrase"))
      .localCheckpoint()

    // ---- gram-index split (q121/q122 at volume) ----
    val grams = graft.llmops.Retrieval.gramIndex(corpus, n = 2).persist()
    time("gram index build+materialize 100x (one-off)") {
      println(s"  ${grams.count()} gram-position rows")
    }
    onBig("gramProbe 100 phrases over held index") {
      graft.llmops.Retrieval.gramProbe(phrases, grams, topN = 10)
    }
    onBig("snippetProbe 100 phrases over held index") {
      graft.llmops.Retrieval.snippetProbe(phrases, grams, corpus,
        n = 2, topN = 10, ctx = 3)
    }
    onBig("one-shot phraseSearch (re-shingles corpus)") {
      graft.llmops.Retrieval.phraseSearch(phrases, corpus, n = 2,
        topN = 10)
    }
    onBig("one-shot phraseSnippets (re-shingles corpus)") {
      graft.llmops.Retrieval.phraseSnippets(phrases, corpus, n = 2,
        topN = 10, ctx = 3)
    }
    grams.unpersist()

    // ---- impact split (q123 at volume): postings and impacts HELD,
    // so the delta between the two probes is pure probe arithmetic ----
    val queries = qdocs.select(col("did").as("qid"), col("text"))
    val postings = graft.llmops.Retrieval.postingsIndex(corpus).persist()
    time("postings build+materialize 100x (one-off)") {
      println(s"  ${postings.count()} posting rows")
    }
    val impacts = graft.llmops.Retrieval.impactIndex(postings).persist()
    time("impact quantization 100x (one-off, per epoch)") {
      println(s"  ${impacts.count()} impact rows")
    }
    val qTok = graft.llmops.Retrieval.queryTerms(queries).localCheckpoint()
    onBig("impactProbe 100 queries over held impacts") {
      graft.llmops.Retrieval.impactProbe(qTok, impacts, topN = 10)
    }
    onBig("bm25ProbeTerms 100 queries over held postings (exact)") {
      graft.llmops.Retrieval.bm25ProbeTerms(qTok, postings, topN = 10)
    }

    // ---- boolean probe (q124 at volume) ----
    val dt = array_sort(array_distinct(graft.llmops.Dedup
      .tokens(col("text"))))
    val qd = qdocs.select(col("did").as("qid"), dt.as("dt"))
      .localCheckpoint()
    onBig("booleanProbe 100 AND(2)+NOT(1) queries over held postings") {
      graft.llmops.Retrieval.booleanProbe(
        qd.select(col("qid"), explode(slice(col("dt"), 1, 2)).as("tok")),
        qd.select(col("qid"),
          element_at(col("dt"), size(col("dt"))).as("tok")),
        postings, topN = 10)
    }

    // ---- delete maintenance (q125 at volume): drop 10%, probe ----
    val survivors = time("indexDelete 10% of 500k docs") {
      graft.llmops.Retrieval.indexDelete(
        corpus.filter(col("did") % 10 === 3).select("did"), postings)
        .persist()
    }
    onBig("bm25Probe 100 queries over the delete-maintained index") {
      graft.llmops.Retrieval.bm25ProbeTerms(qTok, survivors, topN = 10)
    }
    spark.catalog.clearCache()
    spark.stop()
  }
}
