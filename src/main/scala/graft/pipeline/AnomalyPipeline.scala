package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The anomaly-notification pipeline (SURVEY §3.2) —
  * `fink_filters/ztf/filter_anomaly_notification/filter.py:26-268`:
  * SQL filter → approx median (rel. err 0.05, `filter.py:170-172`) →
  * ascending top-k (most anomalous = most negative score) → per-object
  * dedup → driver handoff.
  *
  * One deliberate improvement over the reference (SURVEY §4): the
  * reference collects `trick_par × threshold` rows to pandas and
  * drop_duplicates there; here the per-object dedup is a partitioned
  * window BEFORE the top-k, so the driver sees exactly `threshold` rows
  * and no slack-buffer guesswork — same selection whenever the
  * reference's buffer was large enough.
  */
object AnomalyPipeline {

  /** Most-anomalous selection. Returns (selection, nightly median).
    *
    * @param scoreCol    anomaly score column (lower = more anomalous)
    * @param threshold   rows to hand to the notifier (reference: 10)
    * @param preFilter   optional coordinate/SQL cut
    *                    (`filter.py:161-166`)
    * @param tieBreakCol deterministic tie-breaker among equal scores
    *                    (ZTF alerts: "candid"; frames without it pass
    *                    their own unique id)
    */
  def select(
      df: DataFrame,
      scoreCol: String = "anomaly_score",
      objectIdCol: String = "objectId",
      threshold: Int = 10,
      preFilter: Option[Column] = None,
      tieBreakCol: String = "candid"): (DataFrame, Double) = {
    val base0 = df.filter(col(scoreCol).isNotNull && !isnan(col(scoreCol)))
    val base = preFilter.map(base0.filter).getOrElse(base0)
    val median =
      base.stat.approxQuantile(scoreCol, Array(0.5), 0.05).headOption
        .getOrElse(Double.NaN)
    val w = Window.partitionBy(objectIdCol)
      .orderBy(col(scoreCol).asc, col(tieBreakCol).asc)
    val top = base
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .orderBy(col(scoreCol).asc, col(tieBreakCol).asc)
      .limit(threshold)
    (top, median)
  }

  /** Per-night top-`n` anomalies — the nightly [[select]] semantics as
    * one batch operator over a multi-night frame (per-object dedup to
    * the best (score, tieBreak) row, then rank within the night): the
    * PARTIAL table of the anomaly-history counter (G9). One shuffle on
    * (night, object) for the dedup; the per-night ranking reuses the
    * same partitioning modulo the grain change — at scale this is the
    * nightly batch job whose ≤ n-row output lands in the history
    * table, so the counter never re-scans alert history.
    *
    * Output: (night, object_id, score, rk) with rk 1..n.
    */
  def nightlyTopAnomalies(df: DataFrame, scoreCol: String = "anomaly_score",
      objectIdCol: String = "objectId", nightCol: String = "night",
      n: Int = 10, tieBreakCol: String = "candid"): DataFrame = {
    val perObj = df
      .filter(col(scoreCol).isNotNull && !isnan(col(scoreCol)))
      .groupBy(col(nightCol).as("night"), col(objectIdCol).as("object_id"))
      .agg(min(struct(col(scoreCol).as("s"), col(tieBreakCol).as("tb")))
        .as("best"))
      .select(col("night"), col("object_id"),
        col("best.s").as("score"), col("best.tb").as("tb"))
    val w = Window.partitionBy("night")
      .orderBy(col("score").asc, col("tb").asc, col("object_id"))
    perObj.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= n)
      .drop("tb")
  }

  /** The anomaly-history counter (G9,
    * `filter_anomaly_notification/filter_utils.py:160-192`): how many
    * times each object hit the nightly top-N inside the trailing
    * `deltaDays` window — the reference fetches exactly this Counter
    * from its REST archive; here it reads the stored
    * [[nightlyTopAnomalies]] partials (≤ n rows/night, so the input is
    * bounded by policy, not by corpus size). The as-of date is the
    * newest stored night (a single-row broadcast, never a driver
    * collect).
    */
  def anomalyHistoryCounter(nightly: DataFrame,
      deltaDays: Int = 90): DataFrame = {
    val bounds = nightly.agg(max(col("night")).as("as_of"))
    nightly.crossJoin(broadcast(bounds))
      .filter(col("night") > date_sub(col("as_of"), deltaDays))
      .groupBy("object_id")
      .agg(count(lit(1)).as("n_top_hits"))
      .orderBy(desc("n_top_hits"), asc("object_id"))
  }
}
