package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Official extension-point registration for the native vector kernels:
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) makes
  * `graft_vec_dot`/`graft_vec_ssq` resolvable in ANY session — SQL text
  * included — without touching the internal function registry.
  * `VecExpressions.register` stays as the in-session idempotent path the
  * table loaders use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "graft_vec_dot"),
      (exprs: Seq[Expression]) => FloatVecDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_vec_ssq"),
      new ExpressionInfo(classOf[FloatVecSsq].getName, "graft_vec_ssq"),
      (exprs: Seq[Expression]) => FloatVecSsq(exprs.head)))
    // the custom whole-operator surface (SURVEY §4 tier (c)): the
    // TopKPerKey planner strategy + its column-pruning optimizer rule
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopKColumnPruning)
  }
}
