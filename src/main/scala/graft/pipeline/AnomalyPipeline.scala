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
}
