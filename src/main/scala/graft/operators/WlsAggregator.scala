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

  /** WLS moment sums with weights w = 1/e². */
  case class Moments(sw: Double, swx: Double, swy: Double,
      swxx: Double, swxy: Double) {
    def add(p: Pt): Moments = {
      val w = 1.0 / (p.e * p.e)
      Moments(sw + w, swx + w * p.x, swy + w * p.y,
        swxx + w * p.x * p.x, swxy + w * p.x * p.y)
    }
    def merge(o: Moments): Moments =
      Moments(sw + o.sw, swx + o.swx, swy + o.swy,
        swxx + o.swxx, swxy + o.swxy)
  }

  /** (slope, σ_slope, intercept) — σ from the unscaled covariance. */
  case class Fit(slope: Double, serr: Double, intercept: Double)

  private val agg = new Aggregator[Pt, Moments, Fit] {
    def zero: Moments = Moments(0, 0, 0, 0, 0)
    def reduce(b: Moments, p: Pt): Moments = b.add(p)
    def merge(a: Moments, b: Moments): Moments = a.merge(b)
    def finish(m: Moments): Fit = {
      val denom = m.sw * m.swxx - m.swx * m.swx
      Fit(
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
