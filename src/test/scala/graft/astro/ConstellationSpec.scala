package graft.astro

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Anchor suite for the S11 constellation lookup: bright stars with
  * unambiguous constellation membership (J2000 positions from public
  * catalogs, rounded to 0.01h/0.1°), spread over every declination
  * band of the packaged table, plus totality and kernel checks.
  */
class ConstellationSpec extends AnyFunSuite {

  // (name, raDeg, decDeg, expected full constellation name)
  private val anchors: Seq[(String, Double, Double, String)] = Seq(
    ("Polaris", 37.95, 89.26, "Ursa Minor"),
    ("Kochab", 222.68, 74.16, "Ursa Minor"),
    ("Errai", 354.84, 77.63, "Cepheus"),
    ("Alderamin", 319.64, 62.59, "Cepheus"),
    ("Dubhe", 165.93, 61.75, "Ursa Major"),
    ("Alkaid", 206.89, 49.31, "Ursa Major"),
    ("Eltanin", 269.15, 51.49, "Draco"),
    ("Thuban", 211.10, 64.38, "Draco"),
    ("Schedar", 10.13, 56.54, "Cassiopeia"),
    ("Caph", 2.29, 59.15, "Cassiopeia"),
    ("Capella", 79.17, 45.99, "Auriga"),
    ("Mirfak", 51.08, 49.86, "Perseus"),
    ("Algol", 47.04, 40.96, "Perseus"),
    ("Deneb", 310.36, 45.28, "Cygnus"),
    ("Albireo", 292.68, 27.96, "Cygnus"),
    ("Vega", 279.23, 38.78, "Lyra"),
    ("Alpheratz", 2.10, 29.09, "Andromeda"),
    ("Mirach", 17.43, 35.62, "Andromeda"),
    ("Hamal", 31.79, 23.46, "Aries"),
    ("Aldebaran", 68.98, 16.51, "Taurus"),
    ("Elnath", 81.57, 28.61, "Taurus"),
    ("Castor", 113.65, 31.89, "Gemini"),
    ("Pollux", 116.33, 28.03, "Gemini"),
    ("Betelgeuse", 88.79, 7.41, "Orion"),
    ("Rigel", 78.63, -8.20, "Orion"),
    ("Bellatrix", 81.28, 6.35, "Orion"),
    ("Procyon", 114.83, 5.22, "Canis Minor"),
    ("Regulus", 152.09, 11.97, "Leo"),
    ("Denebola", 177.26, 14.57, "Leo"),
    ("Arcturus", 213.92, 19.18, "Bootes"),
    ("Alphecca", 233.67, 26.71, "Corona Borealis"),
    ("Rasalhague", 263.73, 12.56, "Ophiuchus"),
    ("Altair", 297.70, 8.87, "Aquila"),
    ("Enif", 326.05, 9.88, "Pegasus"),
    ("Markab", 346.19, 15.21, "Pegasus"),
    ("Sirius", 101.29, -16.72, "Canis Major"),
    ("Adhara", 104.66, -28.97, "Canis Major"),
    ("Spica", 201.30, -11.16, "Virgo"),
    ("Zubeneschamali", 229.25, -9.38, "Libra"),
    ("Antares", 247.35, -26.43, "Scorpius"),
    ("Shaula", 263.40, -37.10, "Scorpius"),
    ("KausAustralis", 276.04, -34.38, "Sagittarius"),
    ("Nunki", 283.82, -26.30, "Sagittarius"),
    ("Alphard", 141.90, -8.66, "Hydra"),
    ("Deneb Algedi", 326.76, -16.13, "Capricornus"),
    ("Sadalmelik", 331.45, -0.32, "Aquarius"),
    ("Fomalhaut", 344.41, -29.62, "Piscis Austrinus"),
    ("Diphda", 10.90, -17.99, "Cetus"),
    ("Alnair", 332.06, -46.96, "Grus"),
    ("AlphaPav", 306.41, -56.74, "Pavo"),
    ("Achernar", 24.43, -57.24, "Eridanus"),
    ("AlphaHyi", 29.69, -61.57, "Hydrus"),
    ("Canopus", 95.99, -52.70, "Carina"),
    ("Miaplacidus", 138.30, -69.72, "Carina"),
    ("Avior", 125.63, -59.51, "Carina"),
    ("GammaVel", 122.38, -47.34, "Vela"),
    ("DeltaVel", 131.18, -54.71, "Vela"),
    ("AlphaCen", 219.90, -60.83, "Centaurus"),
    ("Hadar", 210.96, -60.37, "Centaurus"),
    ("Acrux", 186.65, -63.10, "Crux"),
    ("Mimosa", 191.93, -59.69, "Crux"),
    ("AlphaMus", 189.30, -69.14, "Musca"),
    ("AtriaTrA", 252.17, -69.03, "Triangulum Australe"),
    ("AlphaTuc", 334.63, -60.26, "Tucana"),
    ("Peacock-south-Ind", 309.39, -47.29, "Indus"),
    ("AlphaAra", 262.96, -49.88, "Ara"),
    ("BetaGru", 340.67, -46.88, "Grus"),
    ("AlphaDor", 68.50, -55.05, "Dorado"),
    ("AlphaRet", 63.60, -62.47, "Reticulum"),
    ("AlphaPic", 102.05, -61.94, "Pictor"),
    ("AlphaVol", 135.61, -66.40, "Volans"),
    ("AlphaCha", 124.63, -76.92, "Chamaeleon"),
    ("AlphaAps", 221.97, -79.04, "Apus"),
    ("AlphaMen", 92.56, -74.75, "Mensa"),
    ("BetaHyi", 6.44, -77.25, "Hydrus"),
    ("SigmaOct", 317.20, -88.96, "Octans"),
    ("AlphaOct", 316.47, -77.02, "Octans"),
    // deep-south stress anchors: points within ~1 deg of the Oct/Hyi/
    // Men borders, where the pre-refinement table erred by up to ~1 deg
    ("ThetaOct", 0.41, -77.07, "Octans"), // west of Hyi's 00h06m edge
    ("BetaMen", 76.70, -71.32, "Mensa"),
    ("DeltaOct", 216.73, -83.67, "Octans"),
    ("GammaCha", 158.87, -78.61, "Chamaeleon"),
    ("NuOct", 325.37, -77.39, "Octans"),
    ("AlphaCir", 220.63, -64.97, "Circinus"), // thin Cir wedge at -65
    ("GammaTrA", 229.73, -68.68, "Triangulum Australe"),
    ("BetaAps", 250.71, -77.52, "Apus"),
    ("ZetaPup", 120.90, -40.00, "Puppis"),
    ("BetaPic", 86.82, -51.07, "Pictor"),
    ("PicWedge", 93.00, -47.00, "Pictor"),
    ("AlphaCol", 84.91, -34.07, "Columba"),
    ("AlphaPhe", 6.57, -42.31, "Phoenix"),
    ("AlphaScl", 14.65, -29.36, "Sculptor"),
    ("AlphaFor", 48.02, -28.99, "Fornax"),
    ("AlphaLup", 220.48, -47.39, "Lupus"),
    ("GammaCrv", 183.95, -17.54, "Corvus"),
    ("AlphaCrA", 287.37, -37.90, "Corona Australis"),
    ("AlphaLib", 222.72, -16.04, "Libra"),
    ("GalacticCenter", 266.42, -29.01, "Sagittarius"),
    ("M31", 10.68, 41.27, "Andromeda"),
    ("Pleiades", 56.75, 24.12, "Taurus"))

  test("bright-star anchors resolve to their constellations") {
    val bad = anchors.flatMap { case (n, ra, dec, want) =>
      val got = Constellation.name(ra, dec)
      if (got != want) Some(s"$n ($ra,$dec): got $got want $want") else None
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  /** Plain linear first-match scan in B1875 — the reference semantics
    * the RA-bucketed index must reproduce exactly.
    */
  private def linearAbbrev(raH: Double, dec75: Double): String = {
    val rows = ConstellationTable.rows
    var i = 0
    while (i < rows.length) {
      val r = rows(i)
      if (dec75 >= r.decLo && raH >= r.raLo && raH < r.raHi) return r.abbr
      i += 1
    }
    "Oct"
  }

  test("every sky position resolves (dense grid, no gaps)") {
    var n = 0
    val seen = scala.collection.mutable.Set[String]()
    var dec = -89.5
    while (dec <= 89.5) {
      var ra = 0.25
      while (ra < 360.0) {
        seen += Constellation.abbrev(ra, dec); n += 1
        ra += 2.5
      }
      dec += 1.5
    }
    assert(n > 17000)
    // the grid at this resolution must reach nearly all 88
    assert(seen.size >= 85, s"only ${seen.size} constellations seen")
    seen.foreach(a => assert(ConstellationTable.fullNames.contains(a), a))
  }

  test("RA-bucketed index == linear table scan on a fine B1875 grid") {
    // dense sweep including bucket-boundary RAs (multiples of 0.25 h)
    // where an off-by-one in bucket assignment would surface
    var bad = List.empty[String]
    var h = 0.0
    while (h < 24.0) {
      var d = -90.0
      while (d <= 90.0) {
        val lin = linearAbbrev(h, d)
        val idx = Constellation.lookup1875(h, d)
        if (lin != idx) bad ::= s"($h, $d): linear=$lin indexed=$idx"
        d += 0.5
      }
      h += 0.125
    }
    assert(bad.isEmpty, bad.take(10).mkString("\n"))
  }

  test("Column kernel matches the driver-side lookup and stays codegen") {
    val spark = SparkSpec.session
    import spark.implicits._
    val df = anchors.map(a => (a._1, a._2, a._3)).toDF("n", "ra", "dec")
      .withColumn("c", Astro.constellation(col("ra"), col("dec")))
    val got = df.collect().map(r => r.getString(0) -> r.getString(3)).toMap
    anchors.foreach { case (n, _, _, want) => assert(got(n) == want, n) }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython"), plan)
  }

  test("TNS notification payload carries the constellation") {
    val msg = graft.streaming.Notifications.tnsMessage(
      "ZTF21abcdef", "SN Ia", 3.2, 10.68, 41.27)
    assert(msg.contains("*Constellation*: Andromeda"), msg)
    assert(msg.contains("Supernova Ia"), msg)
  }
}
