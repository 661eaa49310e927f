package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Percentile}
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in approximate-query acceleration: rewrites exact
  * `percentile(col, p)` into `approx_percentile(col, p, accuracy)`
  * when `spark.graft.approx.percentile` is true.
  *
  * Why: exact percentile is an ObjectHashAggregate that buffers and
  * sorts EVERY input value per group — at 100 TB that is an
  * unboundedly growing state per group. ApproximatePercentile keeps a
  * fixed-size quantile sketch (Greenwald-Khanna style) with map-side
  * partial merge: state is O(accuracy), not O(rows). Accuracy
  * defaults to the built-in 10000 (error <= 1/accuracy) and can be
  * tuned via `spark.graft.approx.percentile.accuracy`.
  *
  * Injected as a resolution rule (GraftExtensions), same opt-in shape
  * as [[ApproxDistinctRule]].
  */
object ApproxPercentileRule extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.approx.percentile"
  val AccuracyKey = "spark.graft.approx.percentile.accuracy"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "false").toBoolean) plan
    else {
      val accuracy = conf.getConfString(
        AccuracyKey,
        ApproximatePercentile.DEFAULT_PERCENTILE_ACCURACY.toString).toInt
      plan.resolveOperatorsUp {
        case p => p.transformExpressions {
          case ae @ AggregateExpression(pc: Percentile, _, false, _, _)
              // frequency 1L is the plain two-arg percentile form
              if pc.frequencyExpression == Literal(1L) =>
            // Percentile always returns DoubleType; ApproximatePercentile
            // returns child.dataType. Cast the child so the rewrite never
            // changes the aggregate's result type under a resolved ExprId
            // (an int-typed swap would break downstream expressions).
            ae.copy(aggregateFunction = new ApproximatePercentile(
              Cast(pc.child, DoubleType), pc.percentageExpression, Literal(accuracy)))
        }
      }
    }
}
