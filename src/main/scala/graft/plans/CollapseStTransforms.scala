package graft.plans

import graft.exprs.StTransform
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY.md §7.5): collapse chained reprojections
  * `st_transform(st_transform(g, a, b), b, c)` → `st_transform(g, a, c)`
  * when the CRS arguments are foldable and the inner target equals the
  * outer source.
  *
  * Every projection routes through the geographic lon/lat hub
  * (graft.geom.Crs), so a→c is the same composition as a→b→c minus the
  * b-projection round-trip — the collapsed form is strictly *more*
  * accurate (one fewer forward/inverse pair of floating-point error) and
  * halves the per-vertex trigonometry. Injected via
  * `GraftSparkExtensions.injectOptimizerRule`.
  */
object CollapseStTransforms extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case StTransform(StTransform(g, innerSrc, innerDst), outerSrc, outerDst)
        if innerDst.foldable && outerSrc.foldable &&
          innerDst.eval() != null && innerDst.eval() == outerSrc.eval() =>
      StTransform(g, innerSrc, outerDst)
  }
}
