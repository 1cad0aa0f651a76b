package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions._

/** Catalyst optimizer rule: inside Filter/Join conditions, stable-sort
  * `And` conjunct chains so cheap predicates evaluate before expensive
  * fuzzy scorers, and cheaper scorers before costlier ones
  * (`token_set_ratio` before `WRatio` — the reference's two-tier
  * economics, enforced by the planner instead of the query author).
  *
  * Legal because conjunct reordering over deterministic predicates is
  * already within Spark's own optimizer contract (PushDownPredicates
  * splits and reassembles conjuncts freely); chains containing any
  * non-deterministic conjunct are left untouched. Stable sort keeps the
  * rule idempotent and preserves author order among equal-cost conjuncts.
  */
object FuzzyConjunctReorder extends Rule[LogicalPlan] with PredicateHelper {

  /** Relative evaluation cost of the most expensive scorer inside. */
  private def cost(e: Expression): Int = {
    val scores = e.collect {
      case _: WRatio => 100
      case _: TokenSetRatio => 60
      case _: TokenSortRatio => 50
      case _: PartialRatio => 40
      case _: FuzzRatio => 30
    }
    if (scores.isEmpty) 0 else scores.max
  }

  private def reorder(cond: Expression): Expression = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.lengthCompare(2) < 0 || !conjuncts.forall(_.deterministic)) cond
    else {
      val costs = conjuncts.map(cost)
      if (costs.zip(costs.tail).forall { case (a, b) => a <= b }) cond
      else conjuncts.zip(costs).sortBy(_._2).map(_._1).reduceLeft(And(_, _))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(condition, _) =>
      val r = reorder(condition)
      if (r fastEquals condition) f else f.copy(condition = r)
    case j @ Join(_, _, _, Some(condition), _) =>
      val r = reorder(condition)
      if (r fastEquals condition) j else j.copy(condition = Some(r))
  }
}
