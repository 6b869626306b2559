package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native haversine great-circle separation in DEGREES — the predicate
  * kernel of every spatial cross-match (O17-O20, SURVEY §2.1; the
  * reference delegates to astropy's `search_around_sky`,
  * `fink_filters/ztf/filter_known_tde/filter.py:59-90`).
  *
  * The arithmetic mirrors `Astro.angSepDeg`'s composed-Column formula
  * OPERATION FOR OPERATION (same literal D2R, same association order,
  * `Math.pow(sin, 2.0)` exactly as Catalyst's `POW`), so swapping the
  * composed tree for this single node changes no result bit — the
  * DuckDB oracle mirror (`OracleSql.angSepSql`) and every xmatch
  * golden count stay exact.
  *
  * Being ONE node (rather than a 15-node sin/cos/asin tree) is what
  * makes the spatial zone-prune OPTIMIZER RULE practical: a rewrite
  * can pattern-match `angular_separation(...) < r` reliably — see
  * [[graft.plans.ZonePruneRule]].
  */
case class AngularSeparation(ra1: Expression, dec1: Expression,
    ra2: Expression, dec2: Expression) extends QuaternaryExpression
    with ImplicitCastInputTypes {

  override def first: Expression = ra1
  override def second: Expression = dec1
  override def third: Expression = ra2
  override def fourth: Expression = dec2

  override def dataType: DataType = DoubleType
  override def prettyName: String = "angular_separation"

  // int/float/decimal ra/dec coerce to double exactly like the
  // composed-Column formula (and every Spark math builtin) would
  // (Seq[DataType] covariantly overrides Seq[AbstractDataType] —
  // AbstractDataType itself is private[sql])
  override def inputTypes: Seq[DataType] = Seq.fill(4)(DoubleType)

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    AngularSeparation.compute(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.expressions.AngularSeparation.compute($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(ra1 = newFirst, dec1 = newSecond, ra2 = newThird, dec2 = newFourth)
}

object AngularSeparation {

  private final val D2R = 0.017453292519943295 // math.Pi / 180.0

  /** Java-callable kernel (referenced from generated code). Term order
    * matches the composed-Column formula exactly:
    * 2·asin(√(min(1, sin²(Δdec/2) + cos(dec1)·cos(dec2)·sin²(Δra/2)))).
    * The radicand is clamped to 1.0: floating-point error can push it
    * slightly above 1 for near-antipodal inputs, and an unclamped
    * asin(>1) = NaN would silently drop rows from `sep < r` predicates
    * instead of returning ~180°. The oracle mirror clamps identically.
    */
  def compute(ra1: Double, dec1: Double, ra2: Double, dec2: Double): Double = {
    val dra = (ra2 - ra1) * D2R / 2.0
    val ddec = (dec2 - dec1) * D2R / 2.0
    val a = Math.pow(Math.sin(ddec), 2.0) +
      Math.cos(dec1 * D2R) * Math.cos(dec2 * D2R) *
        Math.pow(Math.sin(dra), 2.0)
    Math.asin(Math.sqrt(Math.min(1.0, a))) * 2.0 / D2R
  }

  def angularSeparation(ra1: Column, dec1: Column,
      ra2: Column, dec2: Column): Column =
    org.apache.spark.sql.graftbridge.ExpressionBridge.column(
      AngularSeparation(
        org.apache.spark.sql.graftbridge.ExpressionBridge.expression(ra1),
        org.apache.spark.sql.graftbridge.ExpressionBridge.expression(dec1),
        org.apache.spark.sql.graftbridge.ExpressionBridge.expression(ra2),
        org.apache.spark.sql.graftbridge.ExpressionBridge.expression(dec2)))
}
