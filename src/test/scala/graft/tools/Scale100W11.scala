package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100×-scale soak for the round-14 additions — DSIR importance
  * resampling ([[graft.llmops.Curation.dsirSelect]], q140) and
  * WordPiece training/application ([[graft.llmops.WordPiece]], q141)
  * on the [[Scale100W9]] corpus (500k docs × 43 tokens, 21.5M token
  * occurrences, ~100k-term rare vocabulary, md5-derived, no RNG):
  *
  *  - `dsirSelect` with a 20% target slice, B = 4096 buckets,
  *    k = 1000 — the corpus-sized cost is the ONE tokenize+count
  *    pass (unigrams+bigrams ≈ 43M features); the fits are
  *    bucket-bounded re-aggregations, the weight model is ≤4096
  *    driver rows broadcast back, selection is a top-k;
  *  - `WordPiece.train` (30 merges, minTf 1) — dict pass + the
  *    driver-local merge loop over the ~100k-word dict;
  *  - `WordPiece.segmentStats` application back over all 500k docs —
  *    dict-priced greedy matching (once per distinct token), the
  *    corpus paying only the word-count aggregation.
  *
  * Measured (32 cores, warm, idle window): dsirSelect 19.2 s
  * end-to-end (the tokenize+bucket+count pass dominates — bucket
  * hashing md5s 43M n-grams; fits + weight model + scoring join +
  * top-k are the small remainder), wordpiece train 6.0 s (dict
  * aggregation; the 30-merge driver loop on the 100k-word dict is
  * sub-second), segmentStats application 2.1 s. Confirms the scale
  * claims under test: nothing driver-side or shuffle-side scales
  * past the vocabulary/bucket bound, and both operators pay the
  * corpus exactly once per pass.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt 'Test/runMain graft.tools.Scale100W11'
  */
object Scale100W11 {
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

    val rare = transform(sequence(lit(0), lit(39)),
      i => concat(lit("t"), substring(md5(
        (((col("doc_id") / 50).cast("long") * 40 + i) % 100000)
          .cast("string")), 1, 8)))
    val stop = transform(sequence(lit(0), lit(2)),
      i => concat(lit("the"), pmod(col("doc_id") + i, lit(10))
        .cast("string")))
    val corpus = spark.range(500000L).toDF("doc_id")
      .select(col("doc_id"),
        concat_ws(" ", concat(rare, stop)).as("text"))
      .localCheckpoint()

    time("dsirSelect 500k docs / ~43M hashed features (B=4096, k=1000)") {
      val sel = graft.llmops.Curation.dsirSelect(corpus,
        pmod(col("doc_id"), lit(5)) === 0, k = 1000, buckets = 4096)
        .collect()
      println(s"  selected: ${sel.length}, top score ${sel.head.getLong(1)}")
    }

    val pieces = time("wordpiece train (30 merges over the ~100k-word dict)") {
      val (merges, ps, _) = graft.llmops.WordPiece.train(corpus,
        nMerges = 30)
      println(s"  merges: ${merges.take(5).map { case (a, b) =>
        s"$a+$b" }.mkString(", ")}…; ${ps.length} pieces")
      ps
    }

    time("wordpiece segmentStats application over all 500k docs") {
      println(s"  distinct applied pieces: ${graft.llmops.WordPiece
        .segmentStats(corpus, pieces).count()}")
    }
    spark.stop()
  }
}
