package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{DotProduct, Norm2}

/** Optimizer rule: `graft_dot(x, x)` -> `graft_norm2(x)` when `x` is
  * deterministic. The self-dot generates two unsafe-array reads per
  * element (left and right codegen independently even when they are the
  * same expression); the norm form reads each element once. Values are
  * bit-identical (same left-to-right v*v accumulation), so the rewrite
  * is purely physical — which is exactly what an optimizer rule may
  * change and a gate hash-match must not notice. Guarded on
  * determinism: a non-deterministic child is evaluated twice by the
  * self-dot, and collapsing it to one evaluation would change results.
  */
object RewriteSelfDot extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotProduct(a, b) if a.deterministic && a.fastEquals(b) => Norm2(a)
    }
}
