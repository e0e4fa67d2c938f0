package graft.plans

import graft.functions.{DotProductFloat, Norm2Float}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY.md §4 item 4 — the `injectOptimizerRule`
  * extension surface): `graft_dot(x, x)` → `graft_norm2(x)`.
  *
  * Sound because the replacement performs the identical sequential
  * double accumulation over the identical elements (see [[Norm2Float]]),
  * and cheaper because the fused loop reads the array buffer once per
  * element instead of twice. The guard is SEMANTIC equality
  * (`Expression.semanticEquals`, i.e. canonicalized equality — not
  * object identity), restricted to deterministic children: a
  * nondeterministic x must evaluate twice in `graft_dot(x, x)` and
  * cannot be collapsed to one evaluation.
  *
  * Installed by [[graft.GraftExtensions]] via `injectOptimizerRule`, so
  * any session built with the extension optimizes user-written
  * `graft_dot(v, v)` (the common "squared norm" idiom in similarity
  * pipelines) without the user knowing `graft_norm2` exists. */
object RewriteSelfDot extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotProductFloat(a, b)
          if a.deterministic && b.deterministic && a.semanticEquals(b) =>
        Norm2Float(a)
    }
}
