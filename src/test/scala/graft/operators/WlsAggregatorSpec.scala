package graft.operators

import graft.SparkSpec
import graft.operators.WlsAggregator.Pt

/** The typed WLS Aggregator must agree exactly with an independent
  * driver-side weighted fit — including across repartitions (merge
  * associativity) — and recover known lines.
  */
class WlsAggregatorSpec extends SparkSpec {

  import spark.implicits._

  private def driverFit(pts: Seq[Pt]): (Double, Double, Double) = {
    val w = pts.map(p => 1.0 / (p.e * p.e))
    val sw = w.sum
    val swx = pts.zip(w).map { case (p, wi) => wi * p.x }.sum
    val swy = pts.zip(w).map { case (p, wi) => wi * p.y }.sum
    val swxx = pts.zip(w).map { case (p, wi) => wi * p.x * p.x }.sum
    val swxy = pts.zip(w).map { case (p, wi) => wi * p.x * p.y }.sum
    val denom = sw * swxx - swx * swx
    ((sw * swxy - swx * swy) / denom, math.sqrt(sw / denom),
      (swxx * swy - swx * swxy) / denom)
  }

  test("recovers an exact line regardless of weights") {
    val pts = (1 to 20).map(i => Pt(i.toDouble, 3.5 * i - 2.0,
      0.1 + (i % 5) * 0.3))
    val f = pts.toDS().select(WlsAggregator.fit).head()
    assert(math.abs(f.slope - 3.5) < 1e-9)
    assert(math.abs(f.intercept - -2.0) < 1e-9)
    assert(f.serr > 0)
  }

  test("matches the driver fit on noisy groups, per group key") {
    val rnd = new scala.util.Random(31)
    val groups = (1 to 6).map { g =>
      g -> (1 to 30 + rnd.nextInt(40)).map { _ =>
        val x = rnd.nextDouble() * 100
        Pt(x, 0.7 * x + 5 + rnd.nextGaussian(), 0.5 + rnd.nextDouble())
      }
    }
    val ds = groups.flatMap { case (g, ps) => ps.map(g -> _) }
      .toDS().repartition(7) // exercise partial-agg merge paths
    val got = ds.groupByKey(_._1).mapValues(_._2)
      .agg(WlsAggregator.fit)
      .collect().toMap
    groups.foreach { case (g, ps) =>
      val (s, e, i) = driverFit(ps)
      val f = got(g)
      assert(math.abs(f.slope - s) < 1e-9, s"group $g slope")
      assert(math.abs(f.serr - e) < 1e-9, s"group $g serr")
      assert(math.abs(f.intercept - i) < 1e-9, s"group $g intercept")
    }
  }

  test("degenerate groups yield NaN fits, never Infinity") {
    // single point, all-identical x, and the empty relation are all
    // underdetermined — each must surface as a detectable NaN Fit
    val single = Seq(Pt(1.0, 2.0, 0.5)).toDS().select(WlsAggregator.fit).head()
    assert(single.slope.isNaN && single.serr.isNaN && single.intercept.isNaN)
    val sameX = Seq(Pt(3.0, 1.0, 0.2), Pt(3.0, 9.0, 0.4), Pt(3.0, 4.0, 1.0))
      .toDS().select(WlsAggregator.fit).head()
    assert(sameX.slope.isNaN && !sameX.slope.isInfinity)
    val empty = Seq.empty[Pt].toDS().select(WlsAggregator.fit).head()
    assert(empty.slope.isNaN && empty.serr.isNaN)
  }

  test("agrees with the alert filters' HOF closed form on shared input") {
    // the same moments algebra backs ZtfPhotometryFilters.weightedSlope;
    // cross-check through the public rate-based-KN path is covered by
    // PhotometrySpec — here pin the aggregator against the formula with
    // reference-like magnitudes
    val pts = Seq(Pt(2459000.5, 18.2, 0.05), Pt(2459001.5, 17.9, 0.08),
      Pt(2459002.6, 17.5, 0.04), Pt(2459003.4, 17.2, 0.1))
    val f = pts.toDS().select(WlsAggregator.fit).head()
    val (s, e, i) = driverFit(pts)
    assert(f.slope === s && f.serr === e && f.intercept === i)
  }
}
