package graft.plans

import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression,
  GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual,
  Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst OPTIMIZER RULE: rewrite bounded edit-distance comparisons
  * to the early-exit threshold form.
  *
  * `levenshtein(a, b) <= k` computes the FULL O(|a|·|b|) dynamic
  * program and then compares; Spark's three-argument
  * `levenshtein(a, b, k)` runs the banded O(k·min(|a|,|b|)) DP with a
  * length-difference fast path, returning the distance when it is
  * <= k and -1 otherwise. Every similarity predicate a user writes in
  * the natural form (fuzzy WHERE clauses, similarity-join conditions —
  * the q92 verify step's shape) therefore pays |a|·|b| where k·|a|
  * suffices. This rule rewrites, anywhere in any expression tree:
  *
  *  - `lev(a,b) <= k`  →  `lev(a,b,k) >= 0`
  *  - `lev(a,b) <  k`  →  `lev(a,b,k−1) >= 0`       (k >= 1)
  *  - `lev(a,b) >  k`  →  `lev(a,b,k) = -1`
  *  - `lev(a,b) >= k`  →  `lev(a,b,k) IN (-1, k)`   (-1 ⇔ > k)
  *  - `lev(a,b) =  k`  →  `lev(a,b,k) = k`
  *
  * (and the literal-first mirror of each). The equivalences hold on
  * null inputs — both sides are null-intolerant — and for k = 0. Only
  * non-negative integer LITERAL bounds are rewritten (a column bound
  * would change per row; negative bounds are constant-folded to
  * false/true by Catalyst anyway). Idempotent by construction: the
  * rewritten comparisons compare a THREE-argument Levenshtein, which
  * no pattern here matches again.
  *
  * Same extension tier as [[ZonePruneRule]]
  * (`SparkSessionExtensions.injectOptimizerRule` via
  * [[graft.GraftExtensions]]): a pure expression-level equivalence,
  * but one an expression builder cannot apply — it must see the
  * comparison NODE above the function call.
  */
object BoundedEditDistanceRule extends Rule[LogicalPlan] {

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _ => None
    }
  }

  /** 2-arg levenshtein only — never re-match a rewritten node. */
  private object Lev2 {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Levenshtein(a, b, None) => Some((a, b))
      case _ => None
    }
  }

  private def lev3(a: Expression, b: Expression, k: Int): Expression =
    Levenshtein(a, b, Some(Literal(k)))

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(Lev2(a, b), IntLit(k)) if k >= 0 =>
      GreaterThanOrEqual(lev3(a, b, k), Literal(0))
    case GreaterThanOrEqual(IntLit(k), Lev2(a, b)) if k >= 0 =>
      GreaterThanOrEqual(lev3(a, b, k), Literal(0))
    case LessThan(Lev2(a, b), IntLit(k)) if k >= 1 =>
      GreaterThanOrEqual(lev3(a, b, k - 1), Literal(0))
    case GreaterThan(IntLit(k), Lev2(a, b)) if k >= 1 =>
      GreaterThanOrEqual(lev3(a, b, k - 1), Literal(0))
    case GreaterThan(Lev2(a, b), IntLit(k)) if k >= 0 =>
      EqualTo(lev3(a, b, k), Literal(-1))
    case LessThan(IntLit(k), Lev2(a, b)) if k >= 0 =>
      EqualTo(lev3(a, b, k), Literal(-1))
    case GreaterThanOrEqual(Lev2(a, b), IntLit(k)) if k >= 1 =>
      In(lev3(a, b, k), Seq(Literal(-1), Literal(k)))
    case LessThanOrEqual(IntLit(k), Lev2(a, b)) if k >= 1 =>
      In(lev3(a, b, k), Seq(Literal(-1), Literal(k)))
    case EqualTo(Lev2(a, b), IntLit(k)) if k >= 0 =>
      EqualTo(lev3(a, b, k), Literal(k))
    case EqualTo(IntLit(k), Lev2(a, b)) if k >= 0 =>
      EqualTo(lev3(a, b, k), Literal(k))
  }
}
