package graft.astro

/** Constellation from J2000 ra/dec, Roman (1987): precess the query
  * point to B1875 (IAU-1976 precession, rigid rotation) and take the
  * first [[ConstellationTable]] row containing it. S11 in SURVEY §2.2
  * — the reference reaches this via astropy's `get_constellation`
  * (`filter_tns_match/filter.py:181-183`) for notification payloads.
  *
  * The scan is a ~450-entry in-memory walk per row — a pure map-stage
  * kernel (no join, no broadcast needed: the table is class data).
  */
object Constellation {

  private final val D2R = 0.017453292519943295

  // IAU-1976 precession angles J2000 -> B1875.0 (t in Julian
  // centuries; B1875.0 = JD 2405889.25855)
  private final val T = (2405889.25855 - 2451545.0) / 36525.0
  private final val Zeta =
    (2306.2181 * T + 0.30188 * T * T + 0.017998 * T * T * T) / 3600.0 * D2R
  private final val Z =
    (2306.2181 * T + 1.09468 * T * T + 0.018203 * T * T * T) / 3600.0 * D2R
  private final val Theta =
    (2004.3109 * T - 0.42665 * T * T - 0.041833 * T * T * T) / 3600.0 * D2R

  /** (ζ, z, θ) in radians — exposed so the DuckDB oracle mirror (q79)
    * replays the identical precession algebra with the same constants.
    */
  private[graft] def precessionAngles: (Double, Double, Double) =
    (Zeta, Z, Theta)

  /** IAU abbreviation for a J2000 position (degrees). */
  def abbrev(raDeg: Double, decDeg: Double): String = {
    val ra = raDeg * D2R
    val dec = decDeg * D2R
    val a = math.cos(dec) * math.sin(ra + Zeta)
    val b = math.cos(Theta) * math.cos(dec) * math.cos(ra + Zeta) -
      math.sin(Theta) * math.sin(dec)
    val c = math.sin(Theta) * math.cos(dec) * math.cos(ra + Zeta) +
      math.cos(Theta) * math.sin(dec)
    val raH = {
      val h = (math.atan2(a, b) + Z) / D2R / 15.0
      if (h < 0) h + 24.0 else if (h >= 24.0) h - 24.0 else h
    }
    val dec75 = math.asin(math.max(-1.0, math.min(1.0, c))) / D2R
    val rows = ConstellationTable.rows
    var i = 0
    while (i < rows.length) {
      val r = rows(i)
      if (dec75 >= r.decLo && raH >= r.raLo && raH < r.raHi) return r.abbr
      i += 1
    }
    "Oct" // unreachable: the table ends with a full-sky polar row
  }

  /** Full name, as the reference's notification text prints it. */
  def name(raDeg: Double, decDeg: Double): String =
    ConstellationTable.fullNames(abbrev(raDeg, decDeg))
}
