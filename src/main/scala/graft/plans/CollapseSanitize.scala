package graft.plans

import scala.annotation.tailrec

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.SanitizeStringExpr

/** Optimizer rule: sanitize_string is idempotent, so nested
  * applications collapse to one. Composed pipelines hit this for real —
  * provider extraction sanitizes titles (P4) and the generic load-side
  * cleaning sanitizes every string column again; without the rule the
  * hot path pays the single-pass scan twice.
  *
  * Registered through BOTH hooks: `GraftExtensions.injectOptimizerRule`
  * (session-build time) and usable via
  * `spark.experimental.extraOptimizations` (runtime). The rule is
  * idempotence-only — it never changes results, so it is safe at any
  * position in the optimizer.
  */
object CollapseSanitize extends Rule[LogicalPlan] {

  @tailrec
  private def strip(e: Expression): Expression = e match {
    case SanitizeStringExpr(c: SanitizeStringExpr) => strip(c)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case s @ SanitizeStringExpr(_: SanitizeStringExpr) => strip(s)
    }
}
