package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100×-scale soak for the round-14 serving composition —
  * [[graft.llmops.RagPipeline.prepare]] on the [[Scale100W8]] corpus
  * (500k docs × 43 tokens), chunked 32/8 into ~1M passages, with
  * md5-derived 16-dim embeddings covering 10% of documents (the
  * mixed-coverage profile the operator documents: uncovered docs ride
  * the term channel only) and 100 query docs:
  *
  *  - stage economics under one run: the corpus-sized cost is
  *    chunk + passage-index build; the probe/fusion/MMR/snippet
  *    stages touch rank-bounded relations (100 × topC) regardless of
  *    corpus size;
  *  - the brute vector channel runs over the COVERED subset (~200k
  *    passages × 100 queries of 16-dim cosines) — the documented
  *    gate form; production swaps the q119 IVF probe at full
  *    coverage.
  *
  * Measured (32 cores, warm, idle window): materializing the audit
  * (all six stage counts = every stage executes end-to-end) 46.8 s —
  * dominated by the chunk + passage-index build and the covered-
  * subset vector channel; the contexts action then completes in 9.4 s
  * against the persisted index. Audit at volume: 1,000,000 passages /
  * 25.5M index postings / 1,200 term + 1,200 vec run rows → 1,200
  * fused → 300 contexts (100 queries × k = 3), 225 of them with a
  * verbatim leading-bigram snippet (the remainder were MMR-diverse
  * picks that never contain the query's opening phrase — the
  * documented null-snippet fallback, passage text intact).
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt 'Test/runMain graft.tools.Scale100W10'
  */
object Scale100W10 {
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
    val docs = spark.range(500000L).toDF("doc_id")
      .select(col("doc_id"),
        concat_ws(" ", concat(rare, stop)).as("text"))
      .localCheckpoint()
    val queries = docs.filter(col("doc_id") % 5000 === 0)
      .select(col("doc_id").as("qid"), col("text"))
    // 16-dim md5-derived embeddings for 10% of docs + every query id
    val embOf = transform(sequence(lit(0), lit(15)),
      i => (conv(substring(md5(concat(col("vec_id").cast("string"),
        lit("d"), i)), 1, 4), 16, 10).cast("double") / 65535.0)
        .cast("float"))
    val vectors = spark.range(500000L).toDF("vec_id")
      .filter(col("vec_id") % 10 === 0 || col("vec_id") % 5000 === 0)
      .select(col("vec_id"), embOf.as("embedding"))
      .localCheckpoint()

    val rag = graft.llmops.RagPipeline.prepare(
      docs, queries, vectors, topC = 12, k = 3)
    val audit = time("RagPipeline audit (all stages execute)") {
      rag.audit.collect().map(r => r.getString(0) -> r.getLong(1))
    }
    println("  " + audit.map { case (s, n) => s"$s=$n" }.mkString(", "))
    time("contexts action (warm index)") {
      val n = rag.contexts.count()
      val withSnip = rag.contexts.filter(col("snippet").isNotNull).count()
      println(s"  contexts=$n with_snippets=$withSnip")
    }
    spark.catalog.clearCache()
    spark.stop()
  }
}
