package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/**
 * Optimizer rule: `size(filter(arr, f)) > 0` → `exists(arr, f)` (and the
 * equivalent comparison spellings). The left form materializes the whole
 * filtered array and then counts it; `exists` short-circuits on the
 * first match and allocates nothing — on a 100 TB scan where such
 * predicates gate every row (e.g. the `text_token_gate` boolean gate
 * in [[graft.demo.SketchQueries]], "keep docs with at least one
 * long token"), the rewrite removes a per-row array allocation
 * proportional to the match count. (The Gopher fraction filters in
 * [[graft.ops.TextAnalysis]] compute `size(filter(...))/n` ratios — a
 * count, not an existence test — and are correctly left untouched.)
 *
 * Semantics are preserved exactly:
 *  - `ArrayExists` is constructed with `followThreeValuedLogic = false`,
 *    so null predicate results count as "no match" — the same treatment
 *    `filter` gives them (dropped, hence not counted by `size`).
 *  - under `spark.sql.legacy.sizeOfNull=true`, `size(null)` is -1 and
 *    the comparison yields FALSE (not null), so the positive forms
 *    rewrite to `coalesce(exists, false)`; the zero-equality forms are
 *    rewritten only under modern null semantics, where both sides are
 *    null-for-null.
 *
 * Registered by [[graft.GraftExtensions]] via `injectOptimizerRule`; for
 * an existing session use
 * `spark.experimental.extraOptimizations ++= Seq(SizeFilterToExists)`.
 */
object SizeFilterToExists extends Rule[LogicalPlan] {

  private def exists(arr: Expression, fn: Expression, legacySize: Boolean): Expression = {
    val e = new ArrayExists(arr, fn, false)
    if (legacySize) Coalesce(Seq(e, Literal(false))) else e
  }

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _ => None
    }
  }

  /**
   * `size(filter(a, f))` eligible for the exists rewrite. Two guards:
   *  - single-argument lambda only — `filter` also accepts an
   *    (element, index) lambda, but `ArrayExists` destructures its
   *    function as one-argument and would MatchError at execution;
   *  - deterministic predicate only — `exists` short-circuits where
   *    `filter` evaluates every element, so a rand()-style predicate
   *    could change results under the rewrite.
   */
  private object SizeOfFilter {
    def unapply(e: Expression): Option[(Expression, Expression, Boolean)] = e match {
      case Size(ArrayFilter(a, f @ LambdaFunction(_, Seq(_), _)), legacy)
          if f.deterministic =>
        Some((a, f, legacy))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // size(filter(a, f)) > 0  /  size(...) >= 1
    case GreaterThan(SizeOfFilter(a, f, legacy), IntLit(0)) =>
      exists(a, f, legacy)
    case GreaterThanOrEqual(SizeOfFilter(a, f, legacy), IntLit(1)) =>
      exists(a, f, legacy)
    // 0 < size(filter(a, f))  /  1 <= size(...)
    case LessThan(IntLit(0), SizeOfFilter(a, f, legacy)) =>
      exists(a, f, legacy)
    case LessThanOrEqual(IntLit(1), SizeOfFilter(a, f, legacy)) =>
      exists(a, f, legacy)
    // size(filter(a, f)) = 0 — only under modern null semantics (legacy
    // size(null) = -1 makes "= 0" FALSE where NOT exists would be TRUE)
    case EqualTo(SizeOfFilter(a, f, false), IntLit(0)) =>
      Not(new ArrayExists(a, f, false))
    case EqualTo(IntLit(0), SizeOfFilter(a, f, false)) =>
      Not(new ArrayExists(a, f, false))
  }
}
