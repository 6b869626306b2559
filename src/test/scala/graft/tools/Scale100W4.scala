package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100×-scale soak for the retrieval surface (q107/q108) — the
  * [[Scale100]] protocol (noop writes, timed stages, WARN logs) on a
  * synthetic corpus with a REALISTIC Zipf split, unlike the tiny-vocab
  * gate fixture: 500k docs × 40 tokens drawn from a 100k-term rare
  * vocabulary (sparse postings — the regime the token equi-join is
  * built for) plus 3 tokens per doc from a 10-term stopword pool (the
  * skew hazard). md5-derived, no RNG.
  *
  * What the numbers certify (measured: ~26 s per channel warm,
  * ~21-23 s for the two-channel fusion):
  *  - with the STATIC broadcast of the query-term relation the scoring
  *    stage is a map-side probe over the postings — the dominant cost
  *    is the one-off postings materialization (~17 s of the ~26), and
  *    even the unpruned stopword fan-out (45M probe hits vs 800k)
  *    only adds seconds on 32 cores. Before the hint, the static
  *    planner sort-merged and paid a full 21.5M-row shuffle write of
  *    the postings before AQE could convert (74 s → 26 s). `maxDf`
  *    remains the fan-out governor when query batches grow (the probe
  *    OUTPUT scales with queries × df, and only the floor caps df).
  *  - rrfFuse over two channels is rank-arithmetic on ≤ 2·topN rows
  *    per query — never a scale factor.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt 'Test/runMain graft.tools.Scale100W4'
  */
object Scale100W4 {
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

    // 500k docs: 40 rare tokens (terms hashed into a 100k vocabulary;
    // consecutive docs share a 20-token prefix block so queries have
    // real matches) + 3 stopword-pool tokens
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
    val queries = corpus.filter(col("did") % 5000 === 0)
      .select(col("did").as("qid"), col("text"))
      .localCheckpoint() // 100 queries

    onBig("q108 bm25 channel 100x, maxDf=1000 (rare postings only)") {
      graft.llmops.Retrieval.bm25Channel(queries, corpus, topN = 20,
        maxDf = 1000L)
    }
    onBig("q108 bm25 channel 100x, UNPRUNED (stopword fan-out)") {
      graft.llmops.Retrieval.bm25Channel(queries, corpus, topN = 20)
    }
    onBig("q114 bm25 MaxScore 100x, essential=40 (bound prunes stopword docs)") {
      // the 40 rare terms are essential (their posting lists ARE the
      // relevant docs); the stopword pool is non-essential, its summed
      // bound is far below the rank-k candidate score, so the
      // certificate holds and the stopword-only fan-out is never
      // scored — the same volume maxDf removes, but LOSSLESSLY
      graft.llmops.Retrieval.bm25ProbeMaxScore(
        graft.llmops.Retrieval.queryTerms(queries),
        graft.llmops.Retrieval.postingsIndex(corpus).persist(),
        topN = 20, essential = 40)
    }
    onBig("q107 term+bm25 rrf fusion 100x (fusion cost itself)") {
      val bm = graft.llmops.Retrieval.bm25Channel(queries, corpus,
        topN = 20, maxDf = 1000L).select("qid", "did", "rk")
      val ovl = graft.llmops.Retrieval.termChannel(queries, corpus,
        topN = 20, maxDf = 1000L)
      graft.llmops.Retrieval.rrfFuse(
        Seq("bm25" -> bm, "ovl" -> ovl), topK = 10)
    }
    spark.stop()
  }
}
