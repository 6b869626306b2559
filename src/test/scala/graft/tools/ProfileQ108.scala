package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: where a one-shot retrieval gate (q108) spends its time
  * at sf0.1 — run with `sbt 'Test/runMain graft.tools.ProfileQ108'`.
  *
  * Round-12 findings (32 cores, warm), recorded so the next session
  * doesn't re-derive them:
  *
  *  - full q108 ≈ 2.7 s = postings build 1.4 s + invariants 0.2 s +
  *    probe 1.1 s; the raw text scan is 0.07 s.
  *  - the gate corpus parquet is ONE row group → the scan yields ONE
  *    partition, so the tokenization map stage runs on one core;
  *    `repartition(32)` drops the ISOLATED build to 0.22 s (6×).
  *  - BUT a conditional `repartition(cores)` inside `Retrieval.docs`
  *    made every FULL gate SLOWER (family 46.4 → 57.1 s at sf0.1,
  *    canary-adjusted): the text shuffle + extra stage is re-executed
  *    per plan branch (docs() feeds both the query and corpus splits,
  *    and nothing materializes the exchange), which swamps the
  *    parallel-build win. Measured, then REVERTED — the single-
  *    partition scan pipelines into the partial aggregations well
  *    enough that the serial build is cheaper than shuffling text.
  *  - at real corpus scale this hazard vanishes on its own: a 100 TB
  *    corpus scans as thousands of splits, so the build parallelizes
  *    without any shuffle. The gate-scale cost is a small-file
  *    artifact, documented rather than "fixed" into a regression.
  */
object ProfileQ108 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val isQuery = pmod(col("doc_id"), lit(100L)) === 0L
    val queries = d.filter(isQuery)
      .select(col("doc_id").as("qid"), col("text"))
    val corpus = d.filter(!isQuery)
      .select(col("doc_id").as("did"), col("text"))
    def t[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$l: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm JIT/codegen once
    graft.llmops.Retrieval.qBm25(spark, "/root/testdata/sf0.1")
      .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    for (i <- 1 to 2) {
      t(s"rep$i text scan only")(
        corpus.write.format("noop").mode("overwrite").save())
      println("corpus partitions: " + corpus.rdd.getNumPartitions)
      t(s"rep$i build nopersist")(
        graft.llmops.Retrieval.postingsIndex(corpus)
          .write.format("noop").mode("overwrite").save())
      t(s"rep$i build nopersist repart32")(
        graft.llmops.Retrieval.postingsIndex(corpus.repartition(32))
          .write.format("noop").mode("overwrite").save())
      val idx = graft.llmops.Retrieval.postingsIndex(corpus).persist()
      t(s"rep$i build+materialize")(idx.count())
      val (df0, stats) = graft.llmops.Retrieval.postingsInvariants(idx)
      t(s"rep$i invariants")(stats.count() + df0.count())
      t(s"rep$i probe")(
        graft.llmops.Retrieval.bm25Probe(queries, idx, 10)
          .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
      t(s"rep$i full q108")(
        graft.llmops.Retrieval.qBm25(spark, "/root/testdata/sf0.1")
          .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
