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

  /** KLL quantile sketch bytes — the third mergeable profile (HLL =
    * distincts, CMS = frequencies, KLL = QUANTILES). `k = 200` gives
    * ~1.65% one-sided rank error at 99% confidence; the serialized
    * sketch is the stored state, exactly like [[hllDistinctPerKey]]'s
    * binary column: daily (key, kll) rows re-aggregate into weekly /
    * whole-corpus quantiles by MERGING sketches — no second scan of
    * the data, the property `percentile_approx` (a one-shot number)
    * cannot offer.
    */
  /** Live-sketch buffer (kryo-encoded): update() mutates in place on
    * the hot path, so serialization happens only at partial-aggregate
    * shuffle boundaries — a bytes-buffer variant would pay
    * heapify + toByteArray PER INPUT ROW (KBs of alloc/copy each),
    * turning the aggregation O(rows × sketch_size).
    */
  private class KllAgg(k: Int) extends org.apache.spark.sql.expressions
      .Aggregator[Double, org.apache.datasketches.kll.KllDoublesSketch,
        Array[Byte]] {
    import org.apache.datasketches.kll.KllDoublesSketch
    def zero: KllDoublesSketch = KllDoublesSketch.newHeapInstance(k)
    def reduce(s: KllDoublesSketch, v: Double): KllDoublesSketch = {
      s.update(v); s
    }
    def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
      a.merge(b); a
    }
    def finish(s: KllDoublesSketch): Array[Byte] = s.toByteArray
    def bufferEncoder: org.apache.spark.sql.Encoder[KllDoublesSketch] =
      org.apache.spark.sql.Encoders.kryo[KllDoublesSketch]
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }

  /** Byte-level sketch union — shared by [[kllMerge]] (whose INPUTS
    * are already serialized sketches, so bytes are the natural buffer
    * there; row count == sketch count, not data count).
    */
  private object KllByteMergeAgg extends org.apache.spark.sql.expressions
      .Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.memory.Memory
    private def sk(b: Array[Byte]) = KllDoublesSketch.heapify(Memory.wrap(b))
    def zero: Array[Byte] = Array.emptyByteArray
    def reduce(b: Array[Byte], v: Array[Byte]): Array[Byte] = merge(b, v)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (a.isEmpty) b else if (b.isEmpty) a
      else { val s = sk(a); s.merge(sk(b)); s.toByteArray }
    def finish(b: Array[Byte]): Array[Byte] = b
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }

  /** Column aggregate building a KLL sketch of a double column. */
  def kllAgg(valueCol: Column, k: Int = 200): Column =
    udaf(new KllAgg(k)).apply(valueCol)

  /** Per-key quantile sketches: (key, kll binary). Keep the sketch —
    * it is the mergeable state; use [[kllQuantiles]] to read p50/p90/…
    */
  def kllPerKey(df: DataFrame, keyCol: String, valueCol: String,
      k: Int = 200): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(keyCol)
      .agg(kllAgg(col(valueCol).cast("double"), k).as("kll"))

  /** Merge per-key sketch rows (e.g. daily profiles) to one sketch per
    * key — the no-second-scan re-aggregation. The merged sketch's k is
    * carried in the serialized input sketches (set at [[kllPerKey]]
    * build time), not a parameter here.
    */
  def kllMerge(sketches: DataFrame, keyCol: String,
      kllCol: String = "kll"): DataFrame =
    sketches.groupBy(keyCol)
      .agg(udaf(KllByteMergeAgg).apply(col(kllCol)).as("kll"))

  /** Driver-side quantile reads from a serialized KLL sketch. */
  def kllQuantiles(bytes: Array[Byte], qs: Seq[Double]): Seq[Double] = {
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
    val s = KllDoublesSketch.heapify(Memory.wrap(bytes))
    qs.map(q => s.getQuantile(q, QuantileSearchCriteria.INCLUSIVE))
  }
}
