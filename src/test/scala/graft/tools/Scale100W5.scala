package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100×-scale soak for the POSITIONAL family (q115-q118) — the
  * [[Scale100W4]] corpus (500k docs × 43 tokens, 100k-term rare
  * vocabulary + stopword pool, md5-derived, no RNG) driving the
  * build/probe split the q117/q118 certificates gate at sf0.01:
  *
  *  - `positionalIndex` build+materialize is the ONE-OFF cost
  *    (~21.5M postings → ~21.5M positions; same scan, one extra
  *    column);
  *  - `phraseProbe`/`proximityProbe` against the HELD index are the
  *    recurring per-batch cost — broadcast token equi-joins whose
  *    aggregation shuffles carry only matched rows;
  *  - the one-shot `phraseSearch`/`proximitySearch` forms re-pay the
  *    corpus tokenization EVERY call (the q116 one-shot pays it once,
  *    not twice, since the localCheckpoint fix).
  *
  * Measured (32 cores, warm): build+materialize 2.7 s for 21.5M
  * positions; phraseProbe 4.0 s / proximityProbe 6.4 s per 100-query
  * batch vs one-shot 2.6 s / 4.9 s. Honest read: at this corpus shape
  * a single probe costs about one one-shot pass (proximity probes WIN
  * — the one-shot's second tokenization is gone; phrase probes pay
  * single-token fan-out where the shingle semi-join has full-bigram
  * selectivity). The split's structural wins are INGEST
  * (positionalAppend never re-tokenizes landed documents — the q117/
  * q118 certificates) and serving phrase + NEAR/w + arbitrary-m
  * batches from ONE held relation, bucket-pruned when persisted by
  * tok.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt 'Test/runMain graft.tools.Scale100W5'
  */
object Scale100W5 {
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

    // the W4 corpus: 40 rare tokens (20-token shared prefix blocks so
    // phrases have real matches) + 3 stopword-pool tokens
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
    val toks = graft.llmops.Dedup.tokens(col("text"))
    val pairs = qdocs
      .select(col("did").as("qid"),
        element_at(toks, 1).as("tok_a"),
        element_at(toks, 5).as("tok_b"))
      .localCheckpoint()

    // ONE-OFF: build + materialize the positional index (production
    // writes it bucketed by tok; persist is the local-soak stand-in)
    val positions = graft.llmops.Retrieval.positionalIndex(corpus)
      .persist()
    time("positional index build+materialize 100x (one-off)") {
      println(s"  ${positions.count()} position rows")
    }
    // RECURRING: probe batches against the held index
    onBig("phraseProbe 100 phrases over held index") {
      graft.llmops.Retrieval.phraseProbe(phrases, positions, topN = 10)
    }
    onBig("proximityProbe 100 pairs over held index, w=3") {
      graft.llmops.Retrieval.proximityProbe(pairs, positions,
        window = 3, topN = 10)
    }
    // CONTRAST: the one-shot forms re-pay tokenization per call
    onBig("one-shot phraseSearch (re-tokenizes corpus)") {
      graft.llmops.Retrieval.phraseSearch(phrases, corpus, n = 2,
        topN = 10)
    }
    onBig("one-shot proximitySearch (re-tokenizes corpus)") {
      graft.llmops.Retrieval.proximitySearch(pairs, corpus,
        window = 3, topN = 10)
    }
    spark.catalog.clearCache()
    spark.stop()
  }
}
