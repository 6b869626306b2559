package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100×-scale soak for q126 collocation mining — the
  * [[Scale100W4]]/[[Scale100W6]] corpus (500k docs × 43 tokens,
  * 100k-term rare vocabulary + stopword pool, md5-derived, no RNG).
  *
  * What it exercises at volume: the bigram-count shuffle (≈21.5M
  * gram occurrences combined map-side into ≈490k distinct pairs),
  * the unigram-count shuffle (≈21.5M occurrences → ≈100k terms), the
  * two vocab-scaled component joins (pair relation ⋈ vocab twice —
  * the stage that must stay a plain equi-join, never a broadcast of
  * a 100k-row build side forced by a stale hint), and the top-100
  * TakeOrderedAndProject.
  *
  * Structural checks, asserted not eyeballed: every within-block
  * rare bigram occurs exactly 50× (the block replication factor), so
  * minCount = 5 keeps them and the report is non-empty with all
  * lifts positive; stopword-pool bigrams (≈1/10 selectivity per
  * side) carry lift ≈ N_uni²·c_ab/(N_bi·c_a·c_b) well below the
  * rare-pair lifts, so the top-100 must be all-rare — which pins
  * that the association ranking actually separates signal from
  * stopword noise at volume.
  *
  * Measured (32 cores, warm): 5.8 s end-to-end for the full pass
  * over ≈21.5M token occurrences — count shuffles and the two vocab
  * joins included — with the top-100 all-rare assertion green.
  * Packing: two-level 2.4 s vs naive 1.2 s at 500k docs, equal
  * outputs — honestly, the naive single task WINS at this volume
  * (500k slim rows fit one task trivially); the two-level shape is
  * for the regime where one task cannot hold the corpus prefix at
  * all, which no single-host soak can exhibit — what this soak pins
  * is the EQUALITY, so the scale shape is certified safe to use.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt 'Test/runMain graft.tools.Scale100W7'
  */
object Scale100W7 {
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

    val top = time("collocations 100x (minCount=5, top-100)") {
      graft.llmops.TextOps.collocations(corpus, minCount = 5L,
        topK = 100).collect()
    }
    require(top.length == 100, s"expected a full report, got ${top.length}")
    require(top.forall(_.getLong(5) > 0L), "non-positive lift at volume")
    // the ranking must put rare-vocabulary pairs above stopword noise
    require(top.forall(r => r.getString(0).startsWith("t") &&
      r.getString(1).startsWith("t")),
      "a stopword pair leaked into the top-100")
    println(s"top pair: ${top.head.getString(0)} ${top.head.getString(1)} " +
      s"c_ab=${top.head.getLong(2)} lift_micro=${top.head.getLong(5)}")

    // ---- q127 sequence packing at volume: two-level == naive ----
    val packed = time("concatAndChunk 100x (two-level prefix sum)") {
      graft.llmops.TextOps.concatAndChunk(corpus, ctxLen = 2048)
        .select("doc_id", "start_tok").localCheckpoint()
    }
    // the naive single-window formulation the mirror uses — one task
    // holding all 500k slim (doc_id, n_slot) rows; tolerable in a
    // soak, the thing the operator exists to avoid in production
    val naive = time("naive global-window cumsum (the mirror shape)") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      corpus.select(col("doc_id"),
          (size(graft.llmops.Dedup.tokens(col("text"))).cast("long") +
            lit(1L)).as("n_slot"))
        .select(col("doc_id"),
          coalesce(sum(col("n_slot")).over(w), lit(0L)).as("start_naive"))
        .localCheckpoint()
    }
    val mismatches = packed.join(naive, "doc_id")
      .filter(col("start_tok") =!= col("start_naive")).count()
    require(mismatches == 0L,
      s"two-level prefix sum diverged from naive on $mismatches docs")
    println("concatAndChunk two-level == naive on 500k docs")
    spark.stop()
  }
}
