package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression,
  GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal,
  PredicateHelper, Round, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.expressions.AngularSeparation

/** Catalyst OPTIMIZER RULE: inject the declination zone prune into
  * naive spatial cross-match predicates.
  *
  * A cross-match join condition `angular_separation(ra1, dec1, ra2,
  * dec2) < r` is a theta-join Catalyst can only run as a (broadcast)
  * nested loop, evaluating four trig calls per candidate pair. Since a
  * great-circle separation is always >= the declination difference,
  * `sep < r` implies `|dec1 - dec2| < r` — so the rule conjoins that
  * bound (plus a margin covering `round(sep, n)` wrappers) wherever it
  * finds a separation bound in a Join condition or a post-join Filter.
  * `And` short-circuits in both interpreted and generated code, so the
  * ~3/4 of candidate pairs outside the declination band now cost one
  * subtraction instead of four transcendentals — the optimization the
  * engine's own operators apply by hand (q11, `CrossMatch`), granted
  * automatically to any user-written join.
  *
  * This is the engine's demonstration of the THIRD extension tier
  * (SURVEY §7.3): (a) compose builtins, (b) native `Expression`
  * kernels, (c) a `Rule[LogicalPlan]` via
  * `SparkSessionExtensions.injectOptimizerRule` — used exactly where
  * a rewrite must see the whole predicate tree, which no expression
  * builder can. (A custom SparkStrategy stays unnecessary: after the
  * prune the nested-loop join IS the right physical plan for a
  * broadcast catalog.)
  *
  * Semantics-preserving by construction: the added conjunct is implied
  * by the one it rides with (including on null inputs, where both
  * evaluate to null). Idempotent: a bound whose zone predicate is
  * already present (semantically) is left alone, so the rule converges
  * in one pass and survives re-application across optimizer rounds.
  */
object ZonePruneRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Margin added to the bound: dominates the worst-case displacement
    * of a `round(sep, >= 3)` wrapper (5e-4) and haversine float error.
    */
  private val Eps = 1e-3

  private object DoubleLit {
    def unapply(e: Expression): Option[Double] = e match {
      case Literal(v: Double, DoubleType) => Some(v)
      case _ => None
    }
  }

  /** The separation expression, possibly wrapped in `round(_, n)` with
    * n >= 3 (a coarser round could displace the value past Eps).
    */
  private object Sep {
    def unapply(e: Expression): Option[AngularSeparation] = e match {
      case s: AngularSeparation => Some(s)
      case Round(s: AngularSeparation, Literal(n: Int, _), _) if n >= 3 =>
        Some(s)
      case _ => None
    }
  }

  private object SepBound {
    def unapply(e: Expression): Option[(AngularSeparation, Double)] =
      e match {
        case LessThan(Sep(s), DoubleLit(r)) => Some((s, r))
        case LessThanOrEqual(Sep(s), DoubleLit(r)) => Some((s, r))
        case GreaterThan(DoubleLit(r), Sep(s)) => Some((s, r))
        case GreaterThanOrEqual(DoubleLit(r), Sep(s)) => Some((s, r))
        case _ => None
      }
  }

  private def zonePredicate(s: AngularSeparation, r: Double): Expression =
    LessThanOrEqual(Abs(Subtract(s.dec1, s.dec2)), Literal(r + Eps))

  /** Does `cond` already bound |dec1 − dec2| AT LEAST AS TIGHTLY as
    * the prune we would inject (bound literal <= r + Eps, either
    * operand order, either comparison direction)? Covers both a prior
    * injection and the engine's hand-written prunes (q11's
    * `abs(dec − cdec) < 15.001` — not `semanticEquals` to the
    * injected `<=` form, but just as redundant to duplicate). A
    * LOOSER existing bound does NOT suppress injection: the tight
    * r + Eps conjunct is exactly the short-circuit the rule exists to
    * add.
    */
  private def hasZoneBound(conjuncts: Seq[Expression],
      s: AngularSeparation, r: Double): Boolean = {
    def sameDecs(a: Expression, b: Expression): Boolean =
      (a.semanticEquals(s.dec1) && b.semanticEquals(s.dec2)) ||
        (a.semanticEquals(s.dec2) && b.semanticEquals(s.dec1))
    def covers(a: Expression, b: Expression, bound: Double): Boolean =
      sameDecs(a, b) && bound <= r + Eps
    conjuncts.exists {
      case LessThan(Abs(Subtract(a, b, _), _), DoubleLit(x)) =>
        covers(a, b, x)
      case LessThanOrEqual(Abs(Subtract(a, b, _), _), DoubleLit(x)) =>
        covers(a, b, x)
      case GreaterThan(DoubleLit(x), Abs(Subtract(a, b, _), _)) =>
        covers(a, b, x)
      case GreaterThanOrEqual(DoubleLit(x), Abs(Subtract(a, b, _), _)) =>
        covers(a, b, x)
      case _ => false
    }
  }

  /** Conjoin missing zone predicates; zone-first so the cheap bound
    * short-circuits ahead of the trig it guards. Nondeterministic
    * declination arguments are skipped — re-evaluating them in the
    * injected conjunct would draw new values and could disagree with
    * the original predicate (the same `deterministic` guard Catalyst's
    * own inference rules apply).
    */
  private def rewrite(cond: Expression): Expression = {
    val conjuncts = splitConjunctivePredicates(cond)
    val missing = conjuncts.collect {
      case SepBound(s, r)
          if s.dec1.deterministic && s.dec2.deterministic &&
            !hasZoneBound(conjuncts, s, r) =>
        zonePredicate(s, r)
    }
    if (missing.isEmpty) cond
    else missing.foldRight(cond)(And(_, _))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j: Join if j.condition.isDefined =>
      val c = rewrite(j.condition.get)
      if (c.fastEquals(j.condition.get)) j else j.copy(condition = Some(c))
    case f @ Filter(cond, child) =>
      val c = rewrite(cond)
      if (c.fastEquals(cond)) f else Filter(c, child)
  }
}
