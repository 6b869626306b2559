package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Approximate-counting sketches for 100 TB profiling — the mergeable
  * siblings of the exact queries (q5/q16/q37 count exactly; at corpus
  * scale the daily/rolling versions of those reports run on sketches
  * so re-aggregation never re-reads data).
  *
  *  - HLL (Apache DataSketches via Spark's `hll_sketch_agg`): distinct
  *    counts whose binary sketches MERGE — per-partition/per-day
  *    sketches union into weekly/monthly distincts with no second scan
  *    (the property plain `approx_count_distinct` lacks: it returns a
  *    number, not a reusable state).
  *  - CountMinSketch (Spark's public sketch library): heavy-hitter
  *    frequency estimates with an ε·N overcount bound and zero
  *    undercount, buildable in one pass and point-queryable driver-side.
  *
  * Everything here is public Spark API; SketchesSpec pins the error
  * contracts against exact counts on the fixture corpus.
  */
object Sketches {

  /** Per-key distinct-count sketches: (key, hll_sketch binary,
    * estimate). Keep the SKETCH column in stored profiles — it is the
    * mergeable state; the estimate is a derived view.
    */
  def hllDistinctPerKey(df: DataFrame, keyCol: String, valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(keyCol)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))
      .withColumn("distinct_est",
        hll_sketch_estimate(col("hll")).cast("long"))

  /** Merge per-key sketches (e.g. daily profiles) into one estimate
    * per key — re-aggregation WITHOUT re-reading the data: union the
    * binary sketches, estimate at the end.
    */
  def hllMergeEstimate(sketches: DataFrame, keyCol: String,
      hllCol: String = "hll"): DataFrame =
    sketches.groupBy(keyCol)
      .agg(hll_union_agg(col(hllCol)).as("hll"))
      .withColumn("distinct_est",
        hll_sketch_estimate(col("hll")).cast("long"))

  /** One-pass CountMinSketch over a string column (driver-held,
    * point-queryable). ε bounds the overcount at ε·N with confidence
    * `confidence`; CMS never undercounts.
    */
  def cmsBuild(df: DataFrame, valueCol: String,
      eps: Double = 0.0001, confidence: Double = 0.99,
      seed: Int = 42): CountMinSketch =
    df.stat.countMinSketch(valueCol, eps, confidence, seed)

  /** Estimated frequencies of the given items from a CMS. */
  def cmsEstimate(cms: CountMinSketch, items: Seq[String]): Map[String, Long] =
    items.map(i => i -> cms.estimateCount(i)).toMap

  /** Token-frequency CMS of a document corpus: one pass, the heavy-
    * hitter counterpart of q37's exact top terms (at 100 TB the exact
    * aggregation still works — the CMS is for the interactive/rolling
    * regime where a driver-sized summary answers point queries).
    */
  def tokenCms(docs: DataFrame, textCol: String = "text",
      eps: Double = 0.0001, confidence: Double = 0.99): CountMinSketch =
    cmsBuild(
      docs.select(explode(
        graft.expressions.WordShingles.shingles(col(textCol), 1)).as("t")),
      "t", eps, confidence)
}
