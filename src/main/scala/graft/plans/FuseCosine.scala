package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Divide, EvalMode, Multiply, Sqrt}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: fuse the composed cosine pattern
  * `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` into one
  * [[CosineSimilarity]] pass. Users writing the textbook formula (in
  * SQL via `graft_dot`, or with the Column API) get the fused loop
  * automatically — three array walks become one.
  *
  * Fires only on LEGACY-mode divides, where divide-by-zero yields NULL:
  * the rewrite's `guardZero = false` variant reproduces that exactly,
  * so the transformation is bit-exact on every input. ANSI divides
  * (which THROW on a zero denominator) are left untouched — an
  * optimization must never swallow a user-visible error.
  *
  * Injected by [[GraftExtensions]] via `injectOptimizerRule`; also
  * attachable to a live session through
  * `spark.experimental.extraOptimizations`. */
object FuseCosine extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(DotProduct(a, b),
          Multiply(Sqrt(DotProduct(a2, b2)), Sqrt(DotProduct(a3, b3)), _), ctx)
          if ctx.evalMode == EvalMode.LEGACY &&
            a2.semanticEquals(a) && b2.semanticEquals(a) &&
            a3.semanticEquals(b) && b3.semanticEquals(b) =>
        CosineSimilarity(a, b, guardZero = false)
    }
}
