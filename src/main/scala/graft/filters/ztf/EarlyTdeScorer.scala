package graft.filters.ztf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.filters.AlertFilter

/** Stage 2 of the early-TDE pipeline (SURVEY §3.3) as a DISTRIBUTED
  * closed-form scorer.
  *
  * The reference's stage 2 (`filter_early_tde_candidates/filter.py:
  * 42-226`) runs per candidate on the driver: fetch the full light
  * curve over HTTP, fit the nonlinear Rainbow model (sigmoid rise ×
  * blackbody SED, `lcs.py:269-330`), Monte-Carlo-sample the fit
  * covariance 1000×, and score with two packaged XGBoost binaries.
  * None of that transfers to a self-contained engine: the photometry
  * service and the model binaries are external artifacts. What DOES
  * transfer is the pipeline's shape and its feature semantics — and
  * both have closed forms over the in-alert history:
  *
  *  - per-band σ-weighted LINEAR flux fit, centered on the alert epoch
  *    jd_max: level a = f̂(jd_max) ± σa, rate m = df/dt ± σm, χ² — all
  *    closed-form sums (the linear sibling of Rainbow's sigmoid rise;
  *    same SNANA flux domain as the prefilter);
  *  - `snr_rise_time` → rate significance m/σm per band (the fit
  *    covariance the reference samples is available analytically);
  *  - `temperature` → Wien-approximation color temperature from the
  *    fitted band levels: F_g/F_r = (λr/λg)⁵ · exp(−(hc/k)(1/λg−1/λr)/T)
  *    ⇒ T = (hc/k)(1/λg − 1/λr) / ln[(λr/λg)⁵ / (F_g/F_r)] (the ratio's
  *    T→∞ limit is (λr/λg)⁵ ≈ 3.8; bluer ratios are super-Wien → null),
  *    with the reference's band wavelengths (`lcs.py:47`: g 4770 Å,
  *    r 6231 Å);
  *    `snr_temperature` by first-order error propagation through the
  *    log-ratio;
  *  - `r_chisq` → pooled reduced χ² of the two linear fits;
  *  - `reference_time` → the fitted zero-flux crossing; its propagated
  *    error mirrors the reference's `e_reference_time` cut.
  *
  * Quality cuts mirror `filter.py:184-196`: r_chisq ≤ 10,
  * e_reference_time ≤ 100 d, snr_rise_time ≥ 1.5, snr_temperature
  * ≥ 1.5, plus rising levels in both bands (m > 0 — the linear-model
  * reading of "rise_time > 0").
  *
  * The classifier stage is a pluggable [[TdeScorer]]; the default is a
  * TRANSPARENT logistic model over the same feature vector (documented
  * weights below — a deterministic stand-in for the unshippable XGBoost
  * pair, chosen to prefer hot, significantly-rising, well-fit
  * transients). Everything is Column algebra: at 100 TB this is one
  * map stage over the prefilter survivors — no HTTP, no driver loop,
  * no UDF.
  */
object EarlyTdeScorer {

  /** hc/k in Å·K. */
  private val HcOverK = 1.43877688e8
  /** ZTF effective wavelengths used by the reference, Å (lcs.py:47). */
  private val LambdaG = 4770.0
  private val LambdaR = 6231.0
  /** Wien constants: T = WienC / ln(WienLimit / ratio), with WienLimit
    * the hot-limit flux ratio (λr/λg)⁵.
    */
  private val WienC = HcOverK * (1.0 / LambdaG - 1.0 / LambdaR)
  private val WienLimit = math.pow(LambdaR / LambdaG, 5.0)

  /** ONE fold per band: struct(n, sw, swx, swy, swxx, swxy, swyy) of
    * the σ-weighted sums over (x = jd − jdMax, y = flux). Everything
    * downstream is scalar algebra over this struct — which is why the
    * caller MATERIALIZES it as a column: CollapseProject duplicates
    * non-cheap expressions per reference, and an inline sums fold
    * referenced from every fit field would re-run O(history) work per
    * field (the round-2 lesson that cost q23 8 s).
    */
  private def bandSums(pts: Column, jdMax: Column, band: Int): Column = {
    val bp = filter(pts, p =>
      p.getField("ok") && p.getField("fid") === band)
    val zero = struct(
      lit(0.0).as("sw"), lit(0.0).as("swx"), lit(0.0).as("swy"),
      lit(0.0).as("swxx"), lit(0.0).as("swxy"), lit(0.0).as("swyy"))
    val sums = aggregate(bp, zero, (acc, p) => {
      val x = p.getField("jd") - jdMax
      val y = p.getField("f")
      val w = lit(1.0) / (p.getField("e") * p.getField("e"))
      struct(
        (acc.getField("sw") + w).as("sw"),
        (acc.getField("swx") + w * x).as("swx"),
        (acc.getField("swy") + w * y).as("swy"),
        (acc.getField("swxx") + w * x * x).as("swxx"),
        (acc.getField("swxy") + w * x * y).as("swxy"),
        (acc.getField("swyy") + w * y * y).as("swyy"))
    })
    struct(size(bp).as("n"), sums.as("s"))
  }

  /** Fit struct from a MATERIALIZED sums column: level a ± sa at jdMax
    * (centering makes the intercept the level), rate m ± sm per day,
    * and χ² in its algebraic form
    * Σw(y−a−mx)² = Swyy − 2aSwy − 2mSwxy + a²Sw + 2amSwx + m²Swxx
    * (clamped at 0 against cancellation on near-perfect fits).
    */
  private def fitFromSums(bs: Column): Column = {
    def s(n: String) = bs.getField("s").getField(n)
    val (sw, swx, swy, swxx, swxy, swyy) =
      (s("sw"), s("swx"), s("swy"), s("swxx"), s("swxy"), s("swyy"))
    val denom = sw * swxx - swx * swx
    val m = sdiv(sw * swxy - swx * swy, denom)
    val a = sdiv(swxx * swy - swx * swxy, denom)
    val chi2 = greatest(
      swyy - lit(2.0) * a * swy - lit(2.0) * m * swxy +
        a * a * sw + lit(2.0) * a * m * swx + m * m * swxx,
      lit(0.0))
    struct(bs.getField("n").as("n"),
      a.as("a"), sqrt(sdiv(swxx, denom)).as("sa"),
      m.as("m"), sqrt(sdiv(sw, denom)).as("sm"), chi2.as("chi2"))
  }

  /** Feature struct from the two MATERIALIZED per-band fit columns
    * (attribute references only — cheap under CollapseProject). Fields
    * mirror the reference's feature names where the closed form carries
    * the same meaning.
    */
  /** a/b, NULL when b is 0 or either side null — Spark 4 runs ANSI
    * mode, where even double division by zero THROWS; a zero rate or
    * level must instead null the derived feature (qualityCuts then
    * rejects the row, matching the reference's failed-fit `continue`).
    */
  private def sdiv(a: Column, b: Column): Column =
    when(b =!= 0.0, a / b)

  /** S12 dereddening folded into the ONLY feature it can affect: the
    * per-band WLS is linear, so multiplying band b's fluxes by a
    * constant c_b scales (a, sa, m, sm) by c_b and leaves χ², every
    * SNR, and −a/m invariant. The g/r level ratio — hence the Wien
    * temperature — is therefore the single dereddening-sensitive
    * feature, and the correction is exact as a ratio multiplier:
    * ratio_dered = ratio · 10^(0.4·E(B−V)·(A_g − A_r))
    * (reference applies the same per-point division in
    * `lcs.py:117-127` before its Rainbow fit).
    */
  private def featuresFromFits(g: Column, r: Column, ebv: Column): Column = {
    def f(c: Column, n: String) = c.getField(n)
    val deredden = pow(lit(10.0), lit(0.4) * ebv *
      lit(graft.astro.Dereddening.AvZtf(1) - graft.astro.Dereddening.AvZtf(2)))
    val ratio = sdiv(f(g, "a"), f(r, "a")) * deredden
    val lnr = when(ratio > 0, log(lit(WienLimit) / ratio))
    val temperature = sdiv(lit(WienC), lnr)
    // σ_T = T²/WienC · σ_lnRatio, σ_lnRatio² = (σa_g/a_g)² + (σa_r/a_r)²
    val sLnRatio = sqrt(
      pow(sdiv(f(g, "sa"), f(g, "a")), 2) +
        pow(sdiv(f(r, "sa"), f(r, "a")), 2))
    val snrT = abs(sdiv(lit(WienC), temperature * sLnRatio))
    // rate significance: the weaker band bounds the claim
    val snrRise = least(abs(sdiv(f(g, "m"), f(g, "sm"))),
      abs(sdiv(f(r, "m"), f(r, "sm"))))
    val dof = (f(g, "n") + f(r, "n") - lit(4)).cast("double")
    val rChisq = sdiv(f(g, "chi2") + f(r, "chi2"), dof)
    // zero-crossing t0 − jdMax = −a/m (flux-weighted mean over bands
    // would hide a band disagreement; take the better-measured band)
    val useG = sdiv(f(g, "sm"), abs(f(g, "m"))) <=
      sdiv(f(r, "sm"), abs(f(r, "m")))
    val aBest = when(useG, f(g, "a")).otherwise(f(r, "a"))
    val saBest = when(useG, f(g, "sa")).otherwise(f(r, "sa"))
    val mBest = when(useG, f(g, "m")).otherwise(f(r, "m"))
    val smBest = when(useG, f(g, "sm")).otherwise(f(r, "sm"))
    val relRef = sdiv(-aBest, mBest)
    val eRef = abs(relRef) * sqrt(
      pow(sdiv(saBest, aBest), 2) + pow(sdiv(smBest, mBest), 2))
    struct(
      f(g, "n").as("n_g"), f(r, "n").as("n_r"),
      f(g, "m").as("rate_g"), f(r, "m").as("rate_r"),
      snrRise.as("snr_rise_time"),
      temperature.as("temperature"), snrT.as("snr_temperature"),
      rChisq.as("r_chisq"),
      relRef.as("rel_reference_time"), eRef.as("e_reference_time"))
  }

  /** Adds `tde_features` to the frame. Intermediates (flux history,
    * per-band sums, per-band fits) are materialized as columns so every
    * O(history) fold runs exactly once per row. `deredden = true`
    * applies the S12 correction (see featuresFromFits): if the frame
    * already carries an `ebv` column — e.g. from an upstream
    * [[graft.astro.Dereddening.EbvTable]] enrichment stage (the real
    * dust-map seam) — that value is used; otherwise the coarse
    * cosecant model computes it inline. Pass false for raw-flux
    * features (the synthetic-fit specs pin the uncorrected algebra).
    */
  def withFeatures(df: DataFrame, deredden: Boolean = false): DataFrame = {
    val jdMax = col("candidate.jd").cast("double")
    val ebv =
      if (!deredden) lit(0.0)
      else if (df.columns.contains("ebv")) col("ebv").cast("double")
      else graft.astro.Dereddening.ebvCosecant(
        col("candidate.ra").cast("double"), col("candidate.dec").cast("double"))
    df
      .withColumn("__tde_pts", ZtfPhotometryFilters.fluxHistoryCol)
      .withColumn("__tde_gs", bandSums(col("__tde_pts"), jdMax, 1))
      .withColumn("__tde_rs", bandSums(col("__tde_pts"), jdMax, 2))
      .withColumn("__tde_g", fitFromSums(col("__tde_gs")))
      .withColumn("__tde_r", fitFromSums(col("__tde_rs")))
      .withColumn("tde_features",
        featuresFromFits(col("__tde_g"), col("__tde_r"), ebv))
      .drop("__tde_pts", "__tde_gs", "__tde_rs", "__tde_g", "__tde_r")
  }

  /** Adds the NONLINEAR `rainbow_fit` struct — the distributed
    * Levenberg–Marquardt fit of the reference's Rainbow model
    * (sigmoid bolometric rise × constant-T blackbody,
    * `filter_early_tde_candidates/lcs.py:268-326`) over the same
    * in-row history the closed-form features use, WLS-seeded inside
    * the kernel (see [[graft.expressions.RainbowFit]]). Opt-in: the
    * default pipeline keeps the closed-form features (whose golden
    * regression is pinned), and a trained scorer can consume both.
    */
  def withRainbowFit(df: DataFrame,
      useUpperLimits: Boolean = false): DataFrame =
    df.withColumn("rainbow_fit", graft.expressions.RainbowFit.rainbowFit(
      if (useUpperLimits) ZtfPhotometryFilters.fluxHistoryWithLimitsCol
      else ZtfPhotometryFilters.fluxHistoryCol,
      col("candidate.jd").cast("double")))

  /** The reference's feature-quality cuts (`filter.py:184-196`) read on
    * the closed-form features, plus both-band rising rates.
    */
  def qualityCuts(feat: Column): Column = {
    def q(n: String) = feat.getField(n)
    q("n_g") >= 2 && q("n_r") >= 2 &&
      q("rate_g") > 0 && q("rate_r") > 0 &&
      q("temperature") > 0 &&
      q("r_chisq") <= 10 &&
      q("e_reference_time") <= 100 &&
      q("snr_rise_time") >= 1.5 &&
      q("snr_temperature") >= 1.5
  }

  /** Pluggable classifier over the feature struct — the seam where a
    * real trained model (the reference ships two XGBoost binaries)
    * plugs in at deployment.
    */
  trait TdeScorer {
    def score(feat: Column): Column
  }

  /** Transparent default: logistic score preferring hot,
    * significantly-rising, well-fit candidates. Weights are documented
    * constants, NOT a trained artifact — a deterministic stand-in with
    * the same signature and output range as the reference's
    * `best_score`/`frac_scores` stage, centered so the curated tde
    * fixture's candidates (T ≈ 5.5 kK color temperature, rise SNR ≈ 6)
    * clear the 0.5 threshold while cold / marginal / poorly-fit
    * survivors stay below it.
    */
  object LogisticTdeScorer extends TdeScorer {
    def score(feat: Column): Column = {
      def q(n: String) = feat.getField(n)
      val z =
        lit(-1.2) +
          lit(1.0) * (log(q("temperature")) - math.log(3000.0)) +
          lit(0.5) * log(q("snr_rise_time")) -
          lit(0.3) * q("r_chisq")
      round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
    }
  }

  /** OPTIMIZER BARRIER after the fit stage: pushing downstream
    * predicates through the feature projects substitutes the whole
    * fold tree once per referenced field — the plan balloons to a
    * multi-MB codegen unit (observed OOM). The RDD round-trip pins the
    * boundary (lazy, no storage); downstream consumers (quality cuts,
    * compiled tree scorers) see plain attribute references.
    */
  def featuresBarrier(featured: DataFrame): DataFrame =
    featured.sparkSession.createDataFrame(featured.rdd, featured.schema)

  /** The full stage-1 + stage-2 pipeline: prefilter survivors →
    * closed-form features → quality cuts → classifier threshold.
    * Output: one row per candidate with the feature struct and score.
    * The barrier between the fit and cut stages mirrors the
    * reference's own stage split, where prefilter survivors leave
    * Spark for the driver loop (`filter.py:305-360`) — here they stay
    * distributed, but the planner treats the stages independently.
    */
  def earlyTdeCandidates(df: DataFrame,
      scorer: TdeScorer = LogisticTdeScorer,
      threshold: Double = 0.5): DataFrame = {
    val featured = withFeatures(
      df.filter(ZtfPhotometryFilters.earlyTdePrefilter.mask(df)),
      deredden = true)
    featuresBarrier(featured)
      .filter(qualityCuts(col("tde_features")))
      .withColumn("tde_score", scorer.score(col("tde_features")))
      .filter(col("tde_score") >= threshold)
  }

  /** Registry binding (additive name — stage 1 alone remains
    * `ztf.early_tde_prefilter`).
    */
  private val registryEntry: AlertFilter = new AlertFilter {
    val name = "ztf.early_tde_candidates"
    override val description =
      "Early TDE candidates: prefilter + closed-form rise/color fit + " +
        "logistic score (pluggable scorer seam for a trained model)"
    val requiredColumns = Seq("roid", "cdsxmatch", "nalerthist",
      "candidate", "prv_candidates")
    def mask(df: DataFrame): Column = ZtfPhotometryFilters
      .earlyTdePrefilter.mask(df)
    override def apply(df: DataFrame): DataFrame = earlyTdeCandidates(df)
  }

  graft.filters.FilterRegistry.register(registryEntry)

  def load(): Unit = ()
}
