package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: derive a length-difference pre-filter from bounded
  * edit-distance predicates.
  *
  * `levenshtein(a, b) ≤ k` implies `abs(length(a) − length(b)) ≤ k`
  * (each edit changes the length by at most 1), so the cheap O(1)
  * length test can guard the O(|a|·|b|) distance computation. The
  * derived conjunct is PREPENDED, so conjunctive short-circuit
  * evaluation skips the Levenshtein kernel for every pair the length
  * gap already rejects — on blocked fuzzy joins
  * ([[graft.ext.FuzzyJoin]]) that is most candidate pairs.
  *
  * Soundness: only the un-thresholded Levenshtein form is rewritten —
  * `levenshtein(a, b, t)` returns −1 when the distance exceeds t, so a
  * `≤ k` test on it does NOT imply the length bound. NULL inputs make
  * both the original and the derived conjunct NULL — the filter drops
  * the row either way. Idempotent: the conjunct is skipped when an
  * equivalent one is already present (fixed-point safe).
  *
  * Registered via [[graft.GraftExtensions]] (injectOptimizerRule);
  * exercised end-to-end in `tools.ExtensionsCheckMain` (static-conf
  * injection needs its own JVM), unit-pinned in EditDistancePrefilterSpec.
  */
object EditDistancePrefilter extends Rule[LogicalPlan] with PredicateHelper {

  /** (a, b, bound) for conjuncts bounding an un-thresholded levenshtein.
    * The guard DUPLICATES the operand expressions, so only deterministic
    * operands qualify — a nondeterministic operand (rand()-dependent)
    * would be evaluated twice with different values and the guard could
    * reject rows the real predicate accepts. */
  private def bound(e: Expression): Option[(Expression, Expression, Expression)] =
    (e match {
      case LessThanOrEqual(Levenshtein(a, b, None), k: Literal) => Some((a, b, k))
      case LessThan(Levenshtein(a, b, None), k: Literal) => Some((a, b, k))
      case GreaterThanOrEqual(k: Literal, Levenshtein(a, b, None)) => Some((a, b, k))
      case GreaterThan(k: Literal, Levenshtein(a, b, None)) => Some((a, b, k))
      case EqualTo(Levenshtein(a, b, None), k: Literal) => Some((a, b, k))
      case EqualTo(k: Literal, Levenshtein(a, b, None)) => Some((a, b, k))
      case _ => None
    }).filter { case (a, b, _) => a.deterministic && b.deterministic }

  private def lengthGuard(a: Expression, b: Expression, k: Expression) =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k)

  /** Prepend missing guards to a conjunctive predicate; None = no-op. */
  private def guarded(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val guards = conjuncts.flatMap(bound).map {
      case (a, b, k) => lengthGuard(a, b, k)
    }.filterNot(g => conjuncts.exists(_.semanticEquals(g)))
    if (guards.isEmpty) None
    else Some((guards ++ conjuncts).reduceLeft(And))
  }

  /** Matches both homes a bounded-levenshtein predicate can land in after
    * stock optimization: Filter conditions, and Join conditions (filter
    * pushdown folds the verify predicate of a blocked fuzzy join into the
    * equi-join's extra condition, where it runs per matched row). */
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      guarded(cond).map(Filter(_, child)).getOrElse(f)
    case j @ Join(_, _, _, Some(cond), _) =>
      guarded(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }
}
