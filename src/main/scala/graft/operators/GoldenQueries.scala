package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.classify.Classify
import graft.filters.ztf.ZtfFilters

/** Reference-filter golden queries, oracle-gated over the REAL ZTF
  * alert fixture (`/root/reference/datatest/regular`, 133 alerts) —
  * the q79 pattern applied to the filter catalog: the DuckDB mirror in
  * [[graft.OracleSql]] re-expresses the same predicate cascade in SQL
  * over the same parquet, so the gate certifies the filter semantics
  * against an independent engine, not just against the golden counts
  * the spec suite pins.
  *
  * These queries deliberately IGNORE the scale-factor dir argument:
  * the subject under test is the reference predicate semantics on the
  * reference's own data, which does not scale with SF.
  */
object GoldenQueries {

  /** Single source of truth for the reference ZTF fixture location —
    * OracleSql's DuckDB mirror and the test harness derive from this,
    * so the Spark query and its oracle can never read different data.
    */
  val FixtureDir = "/root/reference/datatest/regular"

  private def fixture(spark: SparkSession): DataFrame =
    spark.read.parquet(FixtureDir)

  /** q80 — the sn_candidates livestream filter
    * (`livestream/filter_sn_candidates/filter.py:86-104`): SuperNNova
    * scores + extragalactic host + freshness + quality cuts. Output is
    * the surviving (objectId, jd) pairs under a total order.
    */
  def q80SnCandidates(spark: SparkSession, dir: String): DataFrame = {
    val df = fixture(spark)
    df.filter(ZtfFilters.snCandidates.mask(df))
      .select(col("objectId").as("object_id"),
        col("candidate.jd").cast("double").as("jd"))
      .orderBy("object_id", "jd")
  }

  /** q81 — the full classification cascade histogram
    * (`classification.py:139-210` via [[Classify.classHistogram]]):
    * nine priority-ordered labels + Ambiguous + the SIMBAD override,
    * exercising seven catalog filters in one gate query.
    */
  def q81ClassHistogram(spark: SparkSession, dir: String): DataFrame =
    Classify.classHistogram(fixture(spark))
      .select(col("class"), col("count").as("n"))
      .orderBy(desc("n"), asc("class"))

  /** q82 — the distributed nonlinear Rainbow light-curve fit (G6,
    * `filter_early_tde_candidates/lcs.py:268-326` re-expressed as the
    * [[graft.expressions.RainbowFit]] Levenberg-Marquardt kernel) over
    * every fixture alert: physical converged fits with 6-decimal
    * parameter rounding under a total order. No DuckDB oracle exists
    * for an iterative nonlinear optimizer, so this rides the driver's
    * rows-only check; parameter VALUES are pinned by RainbowFitSpec
    * (recovery on synthetic curves + optimality vs an independent
    * Nelder-Mead on the same χ²).
    */
  def q82RainbowFit(spark: SparkSession, dir: String): DataFrame =
    graft.filters.ztf.EarlyTdeScorer.withRainbowFit(fixture(spark))
      .select(col("objectId").as("object_id"),
        col("candidate.jd").cast("double").as("jd"),
        col("rainbow_fit.*"))
      .filter(col("converged") && col("rise_time").between(0.5, 100) &&
        col("temperature").between(2000, 50000))
      .select(col("object_id"), col("jd"),
        round(col("t0"), 6).as("t0"),
        round(col("amplitude"), 9).as("amplitude"),
        round(col("rise_time"), 6).as("rise_time"),
        round(col("temperature"), 3).as("temperature"),
        round(col("chi2"), 6).as("chi2"), col("n"))
      .orderBy("object_id", "jd")
}
