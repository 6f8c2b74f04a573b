package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayIntersect, Expression, Literal, Size, SortArray}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, BooleanType, LongType}

import graft.llm.expressions.InterCountExpr

/** Optimizer rule: `size(array_intersect(a, b))` → native
  * [[InterCountExpr]] when both inputs are PROVABLY sorted-ascending
  * and duplicate-free — i.e. both are literally
  * `sort_array(array_distinct(...))` over BIGINT arrays, the exact
  * contract `inter_count` requires (`InterCountExpr.scala:9-18`).
  *
  * Why a rule and not a rewrite at the call sites: the naive spelling
  * is what SQL users actually write, and `array_intersect` builds a
  * hash set and materializes the intersection ARRAY per row only for
  * `size` to throw it away — on a Jaccard-verify hot loop that is an
  * allocation per candidate pair. The rule keeps the user-facing
  * query declarative and swaps in the zero-allocation two-pointer
  * walk during optimization, the same way Catalyst's own
  * ReplaceExpressions rewrites sugar into primitives.
  *
  * Safety: the match demands the `SortArray(ArrayDistinct(_), true)`
  * shape on BOTH sides (any weaker evidence — a sorted column, a
  * constant — is not provable plan-locally and is left alone), and
  * demands non-legacy `size` semantics (`legacySizeOfNull = false`,
  * the Spark 3+ default: NULL input → NULL, matching inter_count's
  * null-safe eval; legacy -1 would diverge). Nullable ELEMENTS are
  * safe too: `array_intersect` counts a null present on both sides
  * once, and `InterCountExpr.count` matches that exactly (ascending
  * sort places the at-most-one distinct null at the head of each
  * side, where the walk counts it like any other shared value). The
  * sort itself is NOT elided — inter_count consumes the sorted
  * arrays.
  *
  * Registered via `GraftExtensions.injectOptimizerRule`, so the
  * rewrite applies to every session of the application.
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {

  private def sortedDistinctLongs(e: Expression): Boolean = e match {
    case SortArray(d @ ArrayDistinct(_), Literal(true, BooleanType)) =>
      d.dataType match {
        case ArrayType(LongType, _) => true
        case _ => false
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(l, r), false)
          if sortedDistinctLongs(l) && sortedDistinctLongs(r) =>
        InterCountExpr(l, r)
    }
}
