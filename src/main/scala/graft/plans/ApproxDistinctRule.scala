package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in approximate-query acceleration: rewrites exact
  * COUNT(DISTINCT x) into HyperLogLog++ when
  * `spark.graft.approx.countDistinct` is true.
  *
  * Why: exact distinct aggregation forces an Expand + extra shuffle of
  * every distinct value; HLL++ is a fixed-size sketch with map-side
  * partial merge — at 100 TB the difference is a full shuffle of the
  * key universe vs. kilobytes per partition. Default rsd 5%.
  *
  * Injected as a resolution rule (GraftExtensions) so it sees the
  * original `AggregateExpression(Count, isDistinct=true)` before the
  * optimizer's distinct-rewrite machinery expands it.
  */
object ApproxDistinctRule extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.approx.countDistinct"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "false").toBoolean) plan
    else plan.resolveOperatorsUp {
      case p => p.transformExpressions {
        case ae @ AggregateExpression(c: Count, _, true, _, _) if c.children.size == 1 =>
          ae.copy(
            aggregateFunction = HyperLogLogPlusPlus(c.children.head),
            isDistinct = false)
      }
    }
}
