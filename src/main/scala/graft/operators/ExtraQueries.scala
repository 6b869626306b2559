package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.astro.Astro

/** Operator-family queries beyond the plain relational suite, each shaped
  * after a SURVEY.md §2 operator and phrased so a DuckDB oracle can verify
  * it on the driver's testdata tables:
  *
  *  - q11 spatial cross-match (O17/O18: broadcast theta-join on an angular
  *    separation predicate — the `cross_match_astropy` analog,
  *    `fink_filters/ztf/filter_known_tde/filter.py:59-90`);
  *  - q12 classification cascade (O21: priority rewrite with ambiguity
  *    rule, `fink_filters/ztf/classification.py:139-210`);
  *  - q13 array/higher-order ops (A1-A3: element_at(-1), slice+forall,
  *    size∘filter over in-row arrays);
  *  - q14 anomaly top-k pipeline (O4→O9→O8→O10:
  *    `filter_anomaly_notification/filter.py:161-188`, with the exact
  *    median and a window-dedup so the result is oracle-deterministic).
  *
  * Determinism: join/filter predicates on trig results are rounded to 6
  * decimals on BOTH sides so libm ulp differences between JVM and DuckDB
  * cannot flip a boundary row.
  */
object ExtraQueries {

  import CoreQueries.table

  /** Pseudo sky coordinates derived deterministically from an integer key —
    * identical arithmetic is mirrored in the oracle SQL.
    */
  private def raOf(k: org.apache.spark.sql.Column) =
    (pmod(k * 7919L, lit(3600L))) / 10.0
  private def decOf(k: org.apache.spark.sql.Column) =
    (pmod(k * 104729L, lit(1200L))) / 10.0 - 60.0

  /** q11 — spatial cross-match: events (pseudo-coordinates from event_id)
    * against a small catalog derived from `nation` (pseudo-coordinates
    * from n_nationkey), match radius 15°. The catalog side is broadcast:
    * at 100 TB this is a BroadcastNestedLoopJoin over a ~KB catalog, never
    * a shuffle of the big side. Returns per-event match count + nearest
    * separation (the nearest-match semantics of O17).
    */
  def q11XmatchSpatial(spark: SparkSession, dir: String): DataFrame = {
    val ev = CoreQueries.events(spark, dir)
      .select(col("event_id"), raOf(col("event_id")).as("ra"),
        decOf(col("event_id")).as("dec"))
    val cat = table(spark, dir, "nation")
      .select(col("n_nationkey").as("cat_id"),
        raOf(col("n_nationkey") + 1L).as("cra"),
        decOf(col("n_nationkey") + 1L).as("cdec"))
    val sep = round(
      Astro.angSepDeg(col("ra"), col("dec"), col("cra"), col("cdec")), 6)
    // Conservative declination bounding box BEFORE the trig: angular
    // separation ≥ |Δdec| always, so |Δdec| < 15.001 (margin covers the
    // 6-decimal rounding) keeps every true match while pruning ~3/4 of
    // the candidate pairs at comparison cost. This is the zone-pruning
    // half of the O17/O18 cross-match design (SURVEY §4).
    ev.join(broadcast(cat),
        abs(col("dec") - col("cdec")) < 15.001 && sep < 15.0)
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_matches"),
        min(sep).as("min_sep_deg"))
      .orderBy("event_id")
  }

  /** q12 — classification cascade: base label rewritten by priority flags,
    * then "Ambiguous" when ≥2 flags fire — the exact shape of the
    * reference's `extract_fink_classification` mask cascade
    * (`classification.py:193-207`).
    */
  def q12ClassifyCascade(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
    val fBig = (col("o_totalprice") > 400000.0).cast("int")
    val fUrgent = (col("o_orderpriority") <= lit("2-HIGH")).cast("int")
    val fDone = (col("o_orderstatus") === "F").cast("int")
    val nFlags = fBig + fUrgent + fDone
    val cls = when(nFlags >= 2, lit("Ambiguous"))
      .when(fBig === 1, lit("BigTicket"))
      .when(fUrgent === 1, lit("Urgent"))
      .when(fDone === 1, lit("Finished"))
      .otherwise(lit("Unknown"))
    o.withColumn("class", cls)
      .groupBy("class")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_price"))
      .orderBy("class")
  }

  /** q13 — array / higher-order ops over the embedding column (A1 latest,
    * A2 count-matching, A3 slice+forall): one codegen'd map stage, no
    * shuffle, column-pruned scan.
    */
  def q13ArrayOps(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
      .select(
        col("vec_id"),
        round(element_at(col("embedding"), -1).cast("double"), 6)
          .as("last_val"),
        size(filter(col("embedding"), x => x > 0)).cast("long").as("n_pos"),
        forall(slice(col("embedding"), -3, 3), x => x.cast("double") > -1.0)
          .cast("int").as("tail3_gt_m1"),
        round(aggregate(slice(col("embedding"), 1, 8), lit(0.0),
          (acc, x) => acc + x.cast("double")), 6).as("head8_sum"))
      .orderBy("vec_id")

  /** q14 — the anomaly-notification pipeline shape: SQL filter → median
    * threshold (exact percentile here so the oracle can agree; production
    * uses approxQuantile) → per-user dedup via partitioned window (the
    * distributed fix for the reference's collect-then-drop_duplicates,
    * SURVEY §4) → top-k with unique tie-break.
    */
  def q14AnomalyTopK(spark: SparkSession, dir: String): DataFrame = {
    val ev = CoreQueries.events(spark, dir)
      .filter(col("value").isNotNull && col("event_type") =!= "view")
    val med = ev.agg(expr("percentile(value, 0.5)").as("med"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id"))
    ev.crossJoin(broadcast(med))
      .filter(col("value") > col("med"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), round(col("value"), 6).as("value"))
      .orderBy(col("value").desc, col("event_id"))
      .limit(10)
  }

  /** q69 — ntile deciles: order-value decile profile per order
    * priority. `ntile(10)` is the equi-POPULATION bucketing (exactly
    * balanced row counts, data-dependent boundaries) — the complement
    * of q55's equi-quantile boundaries and q62's percent_rank: the
    * three relative-rank operators a quality-binning pipeline mixes.
    *
    * Scale shape: the window partitions by priority, so each decile
    * assignment is a per-priority sort inside one exchange — never a
    * global single-partition sort (the classic ntile scale trap; an
    * UNpartitioned ntile serializes the corpus through one task). The
    * (ts, id)-style composite order key (totalprice, orderkey) makes
    * tile membership deterministic under ties, which is what lets two
    * engines agree bucket-exactly.
    */
  def q69ValueDeciles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    table(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy(col("o_orderpriority").as("priority"), col("decile"))
      .agg(count(lit(1)).as("n_orders"),
        round(min(col("o_totalprice")), 2).as("lo"),
        round(max(col("o_totalprice")), 2).as("hi"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double") /
          count(lit(1)), 6).as("avg_price"))
      .orderBy("priority", "decile")
  }
}
