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

  /** RA-bucketed index: bucket b holds (in table order) only the rows
    * whose [raLo, raHi) intersects [b/4, (b+1)/4) hours. First-match
    * semantics are preserved exactly — a query's matching rows all
    * intersect its bucket, in the same relative order — while the scan
    * shrinks from ~470 rows to the bucket's ~15: the per-row constant
    * of this map-stage kernel at 100 TB.
    */
  private final val BucketsPerHour = 4
  private lazy val raIndex: Array[Array[ConstellationTable.Row]] = {
    val n = 24 * BucketsPerHour
    val buckets = Array.fill(n)(
      scala.collection.mutable.ArrayBuffer[ConstellationTable.Row]())
    for (r <- ConstellationTable.rows) {
      val lo = math.max(0, (r.raLo * BucketsPerHour).toInt)
      val hi = math.min(n - 1, math.ceil(r.raHi * BucketsPerHour).toInt - 1)
      var b = lo
      while (b <= hi) { buckets(b) += r; b += 1 }
    }
    buckets.map(_.toArray)
  }

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
    lookup1875(raH, dec75)
  }

  /** First-match scan in B1875 coordinates via the RA index (the
    * post-precession half of [[abbrev]]; package-visible so the spec
    * can pin it against a plain linear scan).
    */
  private[astro] def lookup1875(raH: Double, dec75: Double): String = {
    val rows = raIndex(math.min(raIndex.length - 1,
      math.max(0, (raH * BucketsPerHour).toInt)))
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
