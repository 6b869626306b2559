package graft.filters.rubin

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.astro.Astro

/** Reusable boolean building blocks over the Rubin/LSST alert schema —
  * the engine analog of `fink_filters/rubin/blocks.py`. Every block is a
  * pure Catalyst `Column`; the reference evaluates the same predicates in
  * pandas UDFs (e.g. quality flags at `rubin/blocks.py:396-415`, galactic
  * plane at `blocks.py:70-75`, rising/fading at `blocks.py:262-339`).
  *
  * Null semantics: pandas NaN comparisons yield False; Spark nulls
  * propagate to null which `df.filter` drops — identical selection.
  * Boolean OR-chains coalesce flags to false first so a single null flag
  * cannot poison the conjunction (`blocks.py` relies on pandas fillna-like
  * behavior of `|` over NaN).
  */
object RubinBlocks {

  /** SIMBAD types counted as "no useful match" — `blocks.py:29`
    * (`BAD_VALUES`, where None/NaN mean the cross-match found nothing).
    */
  val BadValues: Seq[String] = Seq("Unknown", "Fail", "Fail 504")

  /** Extragalactic host types (public fink-utils `return_list_of_eg_host`). */
  val EgHosts: Seq[String] = graft.filters.ztf.SimbadClasses.ExtragalacticHosts

  /** VSX variability classes treated as stellar (public fink-utils
    * `return_list_of_stellar`; the membership list is configuration — the
    * fixture carries no VSX matches, and deployments pass their own).
    */
  val VsxStellar: Seq[String] = Seq(
    "Cepheid", "RR Lyrae", "Delta Scuti", "Mira", "Semi-regular",
    "Eclipsing binary", "Rotational", "Flare star", "Irregular", "Other")

  private def ds(f: String): Column = col(s"diaSource.$f")

  /** `pred.is_sso` — `blocks.py:32-47`. */
  def isSolarSystem: Column = coalesce(col("pred.is_sso"), lit(false))

  /** |galactic b| > cut — `blocks.py:50-103` (astropy ICRS→galactic). */
  def outsideGalacticPlane(cutDeg: Double): Column =
    abs(Astro.galacticLatDeg(
      ds("ra").cast("double"), ds("dec").cast("double"))) > cutDeg

  /** SIMBAD match is an extragalactic host — `blocks.py:106-127`.
    * Coalesced: pandas `isin` maps a missing value to False, Spark `isin`
    * to null — and these blocks get NEGATED in composites, where a null
    * would poison the whole conjunction.
    */
  def xmatchedSimbadGalaxy: Column =
    coalesce(col("xm.simbad_otype").isin(EgHosts: _*), lit(false))

  /** SIMBAD match failed / unknown (None counts) — `blocks.py:130-151`. */
  def xmatchedSimbadUnknown: Column = {
    val c = col("xm.simbad_otype")
    c.isNull || c.isin(BadValues: _*)
  }

  /** Mangrove galaxy match — `blocks.py:154-175`. */
  def xmatchedMangrove: Column =
    coalesce(col("xm.mangrove_lum_dist") > 0, lit(false))

  /** Gaia DR3 star with good parallax — `blocks.py:178-210`. */
  def xmatchedGaiaStar: Column = {
    val name = col("xm.gaiadr3_DR3Name")
    val named = name.isNotNull && !name.isin(BadValues: _*)
    coalesce(
      named && (col("xm.gaiadr3_Plx") / col("xm.gaiadr3_e_Plx") > 5),
      lit(false))
  }

  /** VSX stellar match — `blocks.py:213-235` (coalesced, see above). */
  def xmatchedVsxStar: Column =
    coalesce(col("xm.vsx_Type").isin(VsxStellar: _*), lit(false))

  /** First Rubin detection of the object — `blocks.py:342-369`. */
  def isNew: Column =
    ds("midpointMjdTai") === col("misc.firstDiaSourceMjdTaiFink")

  /** The boolean flag columns of the quality cascade — public so the
    * DuckDB oracle mirror is GENERATED from this same list
    * (zero-transcription-drift, the q79 pattern).
    */
  val QualityFlags: Seq[String] = Seq(
    "isDipole", "pixelFlags", "pixelFlags_bad", "pixelFlags_saturated",
    "pixelFlags_streakCenter", "pixelFlags_interpolated", "pixelFlags_cr",
    "pixelFlags_nodata", "pixelFlags_streak", "pixelFlags_edge",
    "psfFlux_flag", "apFlux_flag", "forced_PsfFlux_flag",
    "forced_PsfFlux_flag_edge", "shape_flag", "centroid_flag")

  /** No quality flag set, positive flux, SNR ≥ 6 — `blocks.py:372-418`. */
  def goodQuality: Column = {
    val flagged = QualityFlags
      .map(f => coalesce(ds(f).cast("boolean"), lit(false)))
      .reduce(_ || _) ||
      coalesce(ds("psfFlux") < 0, lit(false)) ||
      coalesce(ds("psfFlux") / ds("psfFluxErr") < 6, lit(false))
    !flagged
  }

  val Bands: Seq[String] = Seq("u", "g", "r", "i", "z", "y")

  /** diaObject column `{band}_{stat}` selected by the CURRENT alert band —
    * the dynamic-column idiom of `rubin/utils.py:49-86` (A8 in SURVEY
    * §2.3), as a 6-way when-chain.
    */
  def bandColumn(stat: String): Column =
    Bands.tail.foldLeft(
      when(ds("band") === Bands.head, col(s"diaObject.${Bands.head}_$stat"))) {
      (acc, b) => acc.when(ds("band") === b, col(s"diaObject.${b}_$stat"))
    }

  /** Flux difference vs per-band object mean with significance —
    * `rubin/utils.py:89-112` + `blocks.py:262-339`.
    */
  private def fluxDiff: (Column, Column) = {
    val diff = ds("psfFlux") - bandColumn("psfFluxMean")
    val signif = abs(diff) > bandColumn("psfFluxMeanErr")
    (diff, signif)
  }

  def isRising: Column = {
    val (diff, signif) = fluxDiff
    coalesce(signif && diff > 0, lit(false))
  }

  def isFading: Column = {
    val (diff, signif) = fluxDiff
    coalesce(signif && diff < 0, lit(false))
  }

  /** ≥2 detections in the current alert's band — A7
    * (`filter_extragalactic_new_candidate/filter.py:26-52`).
    */
  def hasTwoPointsSameBand: Column =
    coalesce(bandColumn("psfFluxNdata") >= 2, lit(false))

  /** Latest PREVIOUS diaSource in the current band, as
    * struct(t, flux) — A6 (`filter_extragalactic_new_candidate/
    * filter.py:55-75`): filter history to the band, sort by time
    * (struct ordering = first field), take the last.
    */
  def latestPrevSameBand: Column = {
    val sameBand = filter(col("prvDiaSources"),
      s => s.getField("band") === ds("band"))
    element_at(
      array_sort(transform(sameBand, s =>
        struct(s.getField("midpointMjdTai").as("t"),
          s.getField("psfFlux").as("flux")))), -1)
  }

  /** Apparent AB magnitude of the current detection (ZP 31.4 nJy). */
  def apparentMag: Column = Astro.fluxNJyToMag(ds("psfFlux"))

  /** Peak absolute magnitude: max psfFluxMax across bands → apparent mag
    * → M = m − μ(z_phot) (flat ΛCDM) — `rubin/utils.py:137-291`.
    */
  def peakAbsoluteMagnitude: Column = {
    val maxFlux = greatest(Bands.map(b => col(s"diaObject.${b}_psfFluxMax")): _*)
    Astro.absMag(Astro.fluxNJyToMag(maxFlux), col("xm.legacydr8_zphot"))
  }

  /** The `extragalactic_base` composite — `blocks.py:421-531`. */
  def extragalacticBase(flavor: String): Column = {
    val legacyValid = coalesce(col("xm.legacydr8_zphot") > 0, lit(false)) &&
      (xmatchedSimbadUnknown || xmatchedSimbadGalaxy)
    val notStar = !xmatchedGaiaStar && !xmatchedVsxStar
    val host = flavor match {
      case "near_galaxy" =>
        xmatchedSimbadGalaxy || xmatchedMangrove || legacyValid
      case "loose" =>
        xmatchedSimbadGalaxy || xmatchedMangrove || legacyValid ||
          xmatchedSimbadUnknown
      case other =>
        throw new IllegalArgumentException(s"unknown flavor '$other'")
    }
    goodQuality && host && outsideGalacticPlane(20) &&
      !isSolarSystem && notStar
  }

  def extragalacticNearGalaxy: Column = extragalacticBase("near_galaxy")
  def extragalacticLoose: Column = extragalacticBase("loose")

  /** True when the top-level `xm` struct carries `field` (fixtures lag the
    * production schema — e.g. `tns_fullname`).
    */
  def xmHasField(df: DataFrame, field: String): Boolean =
    df.schema("xm").dataType match {
      case s: StructType => s.fieldNames.contains(field)
      case _ => false
    }
}
