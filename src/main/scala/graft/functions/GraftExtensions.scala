package graft.functions

import graft.functions.expressions.{ShingleHash60, SortedLongIntersectCount}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizations that exploit the CONTRACTS of graft's custom
  * expressions — knowledge the built-in optimizer cannot have:
  *
  *  - [[ShingleHash60]] output is sorted and duplicate-free, so a user's
  *    defensive `array_distinct` over it is a no-op (each elision removes a
  *    full interpreted hash-set pass per row);
  *  - `SortedLongIntersectCount(a, a)` is `size(a)` for any deterministic
  *    `a` (self-intersection of a set).
  *
  * This is SURVEY §7.1 preference-order case (c): whole-plan semantics via
  * `Rule[LogicalPlan]`, registered through [[GraftExtensions]]
  * (`spark.sql.extensions=graft.functions.GraftExtensions`) or, on a live
  * session, `spark.experimental.extraOptimizations`.
  */
object GraftOptimizations extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayDistinct(s: ShingleHash60) => s
    case SortedLongIntersectCount(a, b) if a.deterministic && a.semanticEquals(b) =>
      Size(a)
  }
}

/** Session-extension entry point: register the graft optimizer rules at
  * session build time (`.config("spark.sql.extensions",
  * "graft.functions.GraftExtensions")` or `builder.withExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => GraftOptimizations)
}
