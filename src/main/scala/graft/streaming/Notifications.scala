package graft.streaming

import org.apache.spark.sql.Row

/** Notification message formatting (O24 sink side) — the pure-string
  * part of the reference's Slack/Telegram fan-out
  * (`filter_early_sn_candidates/filter.py:182-211`,
  * `filter_kn_candidates/filter.py:321-360`). Network delivery stays
  * behind [[StreamPipeline.Notifier]]; these builders are deterministic
  * and unit-testable.
  */
object Notifications {

  private val FilterName = Map(1 -> "g", 2 -> "r")

  /** Sky coordinates in the reference's message format: RA as
    * hours "HH h MM m SS.SS s", Dec as signed "±DD° MM′ SS.S″".
    */
  def formatRaDec(raDeg: Double, decDeg: Double): String = {
    val raH = raDeg / 15.0
    val h = raH.toInt
    val m = ((raH - h) * 60).toInt
    val s = (raH - h - m / 60.0) * 3600
    val sign = if (decDeg < 0) "-" else "+"
    val ad = math.abs(decDeg)
    val d = ad.toInt
    val dm = ((ad - d) * 60).toInt
    val ds = (ad - d - dm / 60.0) * 3600
    f"$h%d h $m%d m $s%.2f s $sign$d%d° $dm%d′ $ds%.1f″"
  }

  /** One alert's notification text: portal link, band/magnitude, time
    * since first detection in hours, position — the reference's message
    * skeleton with the science-module classification.
    */
  def alertMessage(
      objectId: String,
      classification: String,
      fid: Int,
      magpsf: Double,
      sigmapsf: Double,
      jd: Double,
      jdstarthist: Double,
      raDeg: Double,
      decDeg: Double): String = {
    val hours = (jd - jdstarthist) * 24
    f"""*Object:* <https://ztf.fink-portal.org/$objectId|$objectId>
       |*Classification:* $classification
       |*Measurement (band ${FilterName.getOrElse(fid, fid.toString)}):* $magpsf%.2f ± $sigmapsf%.2f
       |*Time since first detection:* $hours%.1f hours
       |*RA/Dec:* ${formatRaDec(raDeg, decDeg)}""".stripMargin
  }

  /** TNS-match notification text — the reference's Telegram skeleton
    * (`filter_tns_match/filter.py:181-196`) with the constellation
    * from the packaged IAU boundary lookup (S11) in place of astropy's
    * `get_constellation`; curve/cutout images stay behind the
    * zero-egress Notifier seam.
    */
  def tnsMessage(
      objectId: String,
      tnsClassification: String,
      daysSinceFirst: Double,
      raDeg: Double,
      decDeg: Double): String = {
    val constellation = graft.astro.Constellation.name(raDeg, decDeg)
    f"""🔭 Appeared $daysSinceFirst%.0f days ago
       |*Object name*: $objectId
       |*Classification*: ${tnsClassification.replace("SN", "Supernova")}
       |*Constellation*: $constellation""".stripMargin
  }

  /** Row adapter for alert DataFrames carrying the standard columns. */
  def fromAlertRow(row: Row, classification: String): String =
    alertMessage(
      row.getAs[String]("objectId"),
      classification,
      row.getAs[Row]("candidate").getAs[Int]("fid"),
      row.getAs[Row]("candidate").getAs[Float]("magpsf").toDouble,
      row.getAs[Row]("candidate").getAs[Float]("sigmapsf").toDouble,
      row.getAs[Row]("candidate").getAs[Double]("jd"),
      row.getAs[Row]("candidate").getAs[Double]("jdstarthist"),
      row.getAs[Row]("candidate").getAs[Double]("ra"),
      row.getAs[Row]("candidate").getAs[Double]("dec"))
}
