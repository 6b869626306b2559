package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the distributed Rainbow fit (G6) three ways:
  *  1. parameter recovery on a synthetic light curve with known truth;
  *  2. optimality against an INDEPENDENT driver-side Nelder–Mead
  *     minimizer of the same χ² (separately-coded model + optimizer,
  *     started far from the truth) — the LM kernel must reach a χ² at
  *     least as low, with matching (t0, rise, T);
  *  3. contract edges: null under 5 points, bitwise determinism, and
  *     non-null fits over the real ZTF fixture via withRainbowFit.
  */
case class RainbowPt(jd: Double, f: Double, e: Double, fid: Int,
    ok: Boolean)

case class RainbowPtUl(jd: Double, f: Double, e: Double, fid: Int,
    ok: Boolean, ul: Boolean)

class RainbowFitSpec extends SparkSpec {

  private type Pt = RainbowPt
  private def Pt(jd: Double, f: Double, e: Double, fid: Int,
      ok: Boolean): RainbowPt = RainbowPt(jd, f, e, fid, ok)

  // ---- independent model implementation (test-local on purpose) ----
  private val H = 6.62607015e-34
  private val Cl = 2.99792458e8
  private val Kb = 1.380649e-23
  private val Sb = 5.670374419e-8
  private def planckSed(lambda: Double, t: Double): Double =
    math.Pi * (2.0 * H * Cl * Cl / math.pow(lambda, 5.0)) /
      (math.exp(H * Cl / (lambda * Kb * t)) - 1.0) / (Sb * math.pow(t, 4.0))
  private def model(u: Double, lambda: Double, t0: Double, a: Double,
      tau: Double, t: Double): Double =
    a / (1.0 + math.exp(-(u - t0) / tau)) * planckSed(lambda, t)

  private val LamG = 4770.0e-10
  private val LamR = 6231.0e-10

  // truth: rise epoch 4 d before the alert, 5-day rise, 8000 K
  private val T0c = -4.0
  private val Amp = 1.0e-2
  private val Tau = 5.0
  private val Temp = 8000.0
  private val JdMax = 2459000.5

  /** Two-band synthetic curve with small deterministic "noise". */
  private def syntheticPts: Seq[Pt] =
    (0 until 30).map { i =>
      val u = -25.0 + i.toDouble
      val lambda = if (i % 2 == 0) LamG else LamR
      val clean = model(u, lambda, T0c, Amp, Tau, Temp)
      val sigma = 0.01 * clean + 2.0e-4 * model(
        5.0, lambda, T0c, Amp, Tau, Temp)
      Pt(JdMax + u, clean + 0.5 * sigma * math.sin(3.7 * i), sigma,
        if (lambda == LamG) 1 else 2, ok = true)
    }

  private def chi2(pts: Seq[Pt], th: Array[Double]): Double =
    pts.map { p =>
      val lambda = if (p.fid == 1) LamG else LamR
      val f = model(p.jd - JdMax, lambda, th(0), math.exp(th(1)),
        math.exp(th(2)), math.exp(th(3)))
      val r = (f - p.f) / p.e
      r * r
    }.sum

  /** Plain Nelder–Mead on θ = (t0, lnA, lnτ, lnT) — independent of the
    * production LM (different algorithm, different code).
    */
  private def nelderMead(f: Array[Double] => Double, start: Array[Double],
      iters: Int): (Array[Double], Double) = {
    val d = start.length
    var simplex = (0 to d).map { i =>
      val v = start.clone()
      if (i > 0) v(i - 1) += (if (v(i - 1) == 0.0) 0.25 else 0.25)
      (v, f(v))
    }.sortBy(_._2).toVector
    for (_ <- 0 until iters) {
      val worst = simplex(d)._1
      val centroid = Array.tabulate(d)(j =>
        simplex.take(d).map(_._1(j)).sum / d)
      def at(t: Double) =
        Array.tabulate(d)(j => centroid(j) + t * (centroid(j) - worst(j)))
      val refl = at(1.0); val fr = f(refl)
      val next =
        if (fr < simplex(0)._2) {
          val exp = at(2.0); val fe = f(exp)
          if (fe < fr) (exp, fe) else (refl, fr)
        } else if (fr < simplex(d - 1)._2) (refl, fr)
        else {
          val con = at(-0.5); val fc = f(con)
          if (fc < simplex(d)._2) (con, fc)
          else { // shrink toward the best
            simplex = (simplex.head +: simplex.tail.map { case (v, _) =>
              val s = Array.tabulate(d)(j =>
                simplex.head._1(j) + 0.5 * (v(j) - simplex.head._1(j)))
              (s, f(s))
            }).sortBy(_._2)
            simplex(d)
          }
        }
      simplex = (simplex.take(d) :+ next).sortBy(_._2)
    }
    (simplex.head._1, simplex.head._2)
  }

  private def fitOf(pts: Seq[Pt]) = {
    import spark.implicits._
    Seq((pts, JdMax)).toDF("pts", "jd_max")
      .select(RainbowFit.rainbowFit(col("pts"), col("jd_max")).as("fit"))
      .selectExpr("fit.t0", "fit.amplitude", "fit.rise_time",
        "fit.temperature", "fit.chi2", "fit.n", "fit.converged")
      .collect()(0)
  }

  test("recovers (t0, rise, T) on a synthetic two-band curve") {
    val r = fitOf(syntheticPts)
    assert(r.getBoolean(6), "fit must converge")
    assert(r.getInt(5) === 30)
    assert(math.abs((r.getDouble(0) - JdMax) - T0c) < 0.2, r.toString)
    assert(math.abs(r.getDouble(2) / Tau - 1.0) < 0.05, r.toString)
    assert(math.abs(r.getDouble(3) / Temp - 1.0) < 0.05, r.toString)
    assert(math.abs(r.getDouble(1) / Amp - 1.0) < 0.10, r.toString)
  }

  test("matches an independent Nelder–Mead minimizer of the same χ²") {
    val pts = syntheticPts
    val r = fitOf(pts)
    // NM starts FAR from the truth (wrong epoch, scale, rise, color)
    val start = Array(-12.0, math.log(Amp * 8.0), math.log(15.0),
      math.log(5000.0))
    val (nmTheta, nmChi2) = nelderMead(chi2(pts, _), start, 4000)
    val lmChi2 = r.getDouble(4)
    assert(lmChi2 <= nmChi2 * (1.0 + 1.0e-6) + 1.0e-9,
      s"LM χ²=$lmChi2 vs NM χ²=$nmChi2")
    assert(math.abs((r.getDouble(0) - JdMax) - nmTheta(0)) < 0.05,
      s"t0 LM=${r.getDouble(0) - JdMax} NM=${nmTheta(0)}")
    assert(math.abs(r.getDouble(2) / math.exp(nmTheta(2)) - 1.0) < 0.01,
      s"τ LM=${r.getDouble(2)} NM=${math.exp(nmTheta(2))}")
    assert(math.abs(r.getDouble(3) / math.exp(nmTheta(3)) - 1.0) < 0.01,
      s"T LM=${r.getDouble(3)} NM=${math.exp(nmTheta(3))}")
  }

  test("null under 5 usable points; bad points don't count") {
    import spark.implicits._
    val four = syntheticPts.take(4)
    val padded = four ++ Seq(
      Pt(JdMax, 1.0, 0.1, 3, ok = true), // unknown band
      Pt(JdMax, 1.0, 0.1, 1, ok = false), // masked
      Pt(JdMax, 1.0, 0.0, 1, ok = true)) // zero error
    val out = Seq((four, JdMax), (padded, JdMax)).toDF("pts", "jd_max")
      .select(RainbowFit.rainbowFit(col("pts"), col("jd_max")).as("fit"))
      .collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("bitwise deterministic across identical rows") {
    import spark.implicits._
    val rows = Seq.fill(3)((syntheticPts, JdMax)).toDF("pts", "jd_max")
      .select(RainbowFit.rainbowFit(col("pts"), col("jd_max")).as("fit"))
      .selectExpr("fit.t0", "fit.rise_time", "fit.temperature", "fit.chi2")
      .collect()
    assert(rows.map(_.toString).distinct.length === 1)
  }

  test("upper limits: inert when absent/loose, binding when violated") {
    import spark.implicits._
    def fitUl(pts: Seq[RainbowPtUl]) =
      Seq((pts, JdMax)).toDF("pts", "jd_max")
        .select(RainbowFit.rainbowFit(col("pts"), col("jd_max")).as("fit"))
        .selectExpr("fit.t0", "fit.amplitude", "fit.rise_time",
          "fit.temperature", "fit.chi2", "fit.n", "fit.converged")
        .collect()(0)
    val det = syntheticPts.map(p =>
      RainbowPtUl(p.jd, p.f, p.e, p.fid, p.ok, ul = false))
    val plain = fitOf(syntheticPts)
    // 1. the extra ul field alone changes nothing (bit-identical)
    assert(fitUl(det).toString === plain.toString)
    // 2. loose limits (10× the true flux at their epochs) are inactive
    //    at the optimum reached from the same seed: still bit-identical
    val loose = det ++ Seq(-20.0, -15.0).map { u =>
      val lim = 10.0 * math.max(1e-6,
        model(u, LamG, T0c, Amp, Tau, Temp))
      RainbowPtUl(JdMax + u, lim, lim / 5.0, 1, ok = false, ul = true)
    }
    assert(fitUl(loose).toString === plain.toString)
    // 3. deep limits the true curve VIOLATES (5σ flux far below the
    //    model on the early rise) must change the fit: the constrained
    //    optimum pushes the early-epoch flux down toward the limits
    val uLim = -12.0
    val deepVal = 0.05 * model(uLim, LamG, T0c, Amp, Tau, Temp)
    val deep = det ++ Seq(
      RainbowPtUl(JdMax + uLim, deepVal, deepVal / 5.0, 1,
        ok = false, ul = true))
    val con = fitUl(deep)
    assert(con.getBoolean(6), "constrained fit must converge")
    assert(con.getInt(5) === 30, "n reports detections only")
    assert(con.toString !== plain.toString,
      "a violated limit must move the optimum")
    def fluxAt(r: org.apache.spark.sql.Row, u: Double) =
      model(u, LamG, r.getDouble(0) - JdMax, r.getDouble(1),
        r.getDouble(2), r.getDouble(3))
    assert(fluxAt(con, uLim) < fluxAt(plain, uLim),
      "constrained model must sit lower at the limit epoch")
    // the hinge really contributed: χ² includes a positive penalty
    assert(con.getDouble(4) > plain.getDouble(4))
  }

  test("fits the real ZTF fixture via withRainbowFit") {
    val fitted = graft.filters.ztf.EarlyTdeScorer
      .withRainbowFit(SparkSpec.ztfRegular)
      .select(col("rainbow_fit").as("fit"))
    val nonNull = fitted.filter(col("fit").isNotNull)
    assert(nonNull.count() > 0, "some alerts must have ≥5 usable points")
    // every produced fit respects the parameter-domain clamps (most
    // fixture alerts are NOT rising transients, so τ/T legitimately
    // sit AT a clamp — allow the exp(log(bound)) round-trip ulp)
    val tol = 1.0 + 1.0e-9
    assert(nonNull.filter(
      col("fit.rise_time") < 1.0e-3 / tol ||
        col("fit.rise_time") > 1.0e4 * tol ||
        col("fit.temperature") < 500.0 / tol ||
        col("fit.temperature") > 1.0e6 * tol ||
        col("fit.n") < 5).count() === 0)
  }
}
