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
 * predicates gate every row (the Gopher line-structure filters in this
 * repo are exactly this shape), the rewrite removes a per-row array
 * allocation proportional to the match count.
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

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // size(filter(a, f)) > 0  /  size(...) >= 1
    case GreaterThan(Size(ArrayFilter(a, f), legacy), IntLit(0)) =>
      exists(a, f, legacy)
    case GreaterThanOrEqual(Size(ArrayFilter(a, f), legacy), IntLit(1)) =>
      exists(a, f, legacy)
    // 0 < size(filter(a, f))  /  1 <= size(...)
    case LessThan(IntLit(0), Size(ArrayFilter(a, f), legacy)) =>
      exists(a, f, legacy)
    case LessThanOrEqual(IntLit(1), Size(ArrayFilter(a, f), legacy)) =>
      exists(a, f, legacy)
    // size(filter(a, f)) = 0 — only under modern null semantics (legacy
    // size(null) = -1 makes "= 0" FALSE where NOT exists would be TRUE)
    case EqualTo(Size(ArrayFilter(a, f), false), IntLit(0)) =>
      Not(new ArrayExists(a, f, false))
    case EqualTo(IntLit(0), Size(ArrayFilter(a, f), false)) =>
      Not(new ArrayExists(a, f, false))
  }
}
