package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100×-scale soak for the round-14 wave — unigram-LM tokenizer
  * training ([[graft.llmops.Unigram]], q138's operator) on the
  * [[Scale100W4]]/[[Scale100W8]] corpus (500k docs × 43 tokens,
  * 21.5M token occurrences, ~100k-term rare vocabulary + stopword
  * pool, md5-derived, no RNG):
  *
  *  - `Unigram.train` at the default production knobs (seedMaxLen 4,
  *    seedSize 2000, 3 EM rounds + the post-prune pass, vocabSize
  *    400) — the corpus-sized cost is the ONE word-dict aggregation;
  *    every EM round is a dict-sized (~100k words) Viterbi map stage
  *    with the ≤2000-piece table broadcast;
  *  - `Unigram.segmentStats` application back over all 500k docs —
  *    the second corpus-sized pass a deployment pays, with the final
  *    piece table broadcast.
  *
  * Measured (32 cores, warm, idle window; two runs): train 7.5-8.2 s
  * end-to-end (seed + 3 EM rounds + prune + final pass over the
  * 100,009-word dict, 400 pieces out), segmentStats application
  * 1.1-1.4 s — confirming the claim under test: the corpus is paid
  * exactly once (the word-dict aggregation) and every Viterbi stage
  * is dict-priced (~100k DPs per round against the broadcast
  * ≤2000-piece table). A first, contended-window run measured
  * 26.9 s / 21.3 s with the ORIGINAL per-occurrence segmentStats
  * (Viterbi on all 21.5M occurrences); the dict-first rewrite cuts
  * the application's DP work by the corpus's 215× occurrence/token
  * ratio — the q74 vocabulary-first lesson applied to tokenizer
  * APPLICATION, and the reason no per-occurrence kernel could
  * compete.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt 'Test/runMain graft.tools.Scale100W9'
  */
object Scale100W9 {
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

    val (pieces, segs) = time(
      "unigram train 500k docs / 21.5M tokens (seed + 3 EM + prune)") {
      val r = graft.llmops.Unigram.train(corpus, vocabSize = 400,
        seedSize = 2000, emRounds = 3)
      println(s"  pieces: ${r._1.count()}, dict words segmented: " +
        s"${r._2.count()}")
      r
    }
    val nMulti = pieces.filter(length(col("piece")) > 1).count()
    println(s"  multi-char pieces kept: $nMulti")

    time("segmentStats application over all 500k docs") {
      println(s"  distinct applied pieces: " +
        s"${graft.llmops.Unigram.segmentStats(corpus, pieces).count()}")
    }
    segs.write.format("noop").mode("overwrite").save()
    spark.stop()
  }
}
