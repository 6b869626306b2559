package graft.operators

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` for the σ-weighted least-squares line fit — the
  * GROUPED form of the per-alert closed-form fit (SURVEY §2.4 G1/G2,
  * `np.polyfit(w=1/dy, cov="unscaled")`): where the alert filters fold
  * an in-row history ARRAY with HOFs, a relational dataset of (group,
  * x, y, σ) points wants `groupBy(...).agg(WlsAggregator.fit)`.
  *
  * The buffer is the five WLS moment sums — constant size per group,
  * combined associatively — so Spark runs it as a partial aggregate
  * with map-side combine: the shuffle carries 5 doubles per group key
  * regardless of how many points a group has, the same scale shape as
  * every built-in agg. (This is the engine's one custom Aggregator;
  * everything else is expressible as Columns — kept deliberately, see
  * SURVEY §7.3.)
  */
object WlsAggregator {

  /** One observation: y(x) measured with 1-σ uncertainty e. */
  case class Pt(x: Double, y: Double, e: Double)

  /** WLS moment sums with weights w = 1/e², plus the x range — the
    * exact degeneracy witness (xmin == xmax ⇔ no two distinct x), which
    * no tolerance on the rounded `sw·swxx − swx²` can provide once x
    * carries a large offset (Julian dates: Var(x)/E[x²] ~ 1e-12).
    */
  case class Moments(sw: Double, swx: Double, swy: Double,
      swxx: Double, swxy: Double,
      xmin: Double = Double.PositiveInfinity,
      xmax: Double = Double.NegativeInfinity) {
    def add(p: Pt): Moments = {
      val w = 1.0 / (p.e * p.e)
      Moments(sw + w, swx + w * p.x, swy + w * p.y,
        swxx + w * p.x * p.x, swxy + w * p.x * p.y,
        math.min(xmin, p.x), math.max(xmax, p.x))
    }
    def merge(o: Moments): Moments =
      Moments(sw + o.sw, swx + o.swx, swy + o.swy,
        swxx + o.swxx, swxy + o.swxy,
        math.min(xmin, o.xmin), math.max(xmax, o.xmax))
  }

  /** (slope, σ_slope, intercept) — σ from the unscaled covariance.
    * A degenerate group (no points, a single point, or all-identical x
    * — the line is underdetermined) yields `Fit(NaN, NaN, NaN)` so the
    * condition is detectable with `isnan`, never a silent ±Infinity.
    */
  case class Fit(slope: Double, serr: Double, intercept: Double)

  private val degenerate = Fit(Double.NaN, Double.NaN, Double.NaN)

  private val agg = new Aggregator[Pt, Moments, Fit] {
    def zero: Moments = Moments(0, 0, 0, 0, 0)
    def reduce(b: Moments, p: Pt): Moments = b.add(p)
    def merge(a: Moments, b: Moments): Moments = a.merge(b)
    def finish(m: Moments): Fit = {
      // sw*swxx - swx² is sw² times the weighted variance of x; the fit
      // is underdetermined with 0 points, a single point, or a single
      // distinct x — witnessed exactly by xmin == xmax (the rounded
      // denom can come out slightly positive there)
      val denom = m.sw * m.swxx - m.swx * m.swx
      if (m.sw <= 0 || denom <= 0 || !(m.xmax > m.xmin)) degenerate
      else Fit(
        (m.sw * m.swxy - m.swx * m.swy) / denom,
        math.sqrt(m.sw / denom),
        (m.swxx * m.swy - m.swx * m.swxy) / denom)
    }
    def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    def outputEncoder: Encoder[Fit] = Encoders.product[Fit]
  }

  /** The aggregating column: `ds.groupByKey(...).agg(WlsAggregator.fit)`
    * or `df.as[Pt].select(fit)`.
    */
  val fit: TypedColumn[Pt, Fit] = agg.toColumn.name("wls_fit")
}
