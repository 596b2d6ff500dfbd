package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule (injectOptimizerRule): rewrites the ubiquitous
  * top-k idiom
  *
  *   row_number().over(Window.partitionBy(keys).orderBy(ord))
  *     .filter(rank <= k)
  *
  * into [[TopKPerKeyNode]] — bounded per-key heaps instead of a full
  * per-partition sort (O(n log k) / O(keys·k) memory vs O(n log n) /
  * a sort buffer of the whole partition; see TopKPerKey.scala). Spark
  * itself only *limits* the sort (WindowGroupLimit); the heap removes
  * it.
  *
  * Deliberately narrow: exactly one window expression, ROW_NUMBER
  * with the default ROWS UNBOUNDED PRECEDING..CURRENT ROW frame, a
  * bare `rank <= literal` / `rank < literal` filter directly above
  * the Window (where the operator-optimization batch normalizes it),
  * and a non-empty ordering. Rank ties are broken arbitrarily —
  * identical to row_number's own contract under a non-total order.
  *
  * Opt-in via `spark.graft.autoTopK=true`: rewriting changes
  * EXPLAIN output, which a user pinning plan shapes (as PlanGuardSpec
  * does for the WindowGroupLimit path) must be able to rely on.
  */
object AutoTopKRule extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.autoTopK", "false") == "true"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case f @ Filter(cond, w: Window) => rewrite(cond, w).getOrElse(f)
    }

  /** The filter bound: `rank <= k` in any of the shapes the optimizer
    * leaves behind (possibly through the user's cast-to-long). */
  private def bound(cond: Expression): Option[(Attribute, Long)] = {
    def strip(e: Expression): Option[Attribute] = e match {
      case a: Attribute => Some(a)
      case Cast(a: Attribute, _, _, _) => Some(a)
      case _ => None
    }
    cond match {
      case LessThanOrEqual(l, Literal(v: Int, IntegerType)) => strip(l).map(_ -> v.toLong)
      case LessThanOrEqual(l, Literal(v: Long, LongType)) => strip(l).map(_ -> v)
      case LessThan(l, Literal(v: Int, IntegerType)) => strip(l).map(_ -> (v.toLong - 1))
      case LessThan(l, Literal(v: Long, LongType)) => strip(l).map(_ -> (v - 1))
      case GreaterThanOrEqual(Literal(v: Int, IntegerType), r) => strip(r).map(_ -> v.toLong)
      case GreaterThan(Literal(v: Int, IntegerType), r) => strip(r).map(_ -> (v.toLong - 1))
      case _ => None
    }
  }

  private def rewrite(cond: Expression, w: Window): Option[LogicalPlan] =
    bound(cond).flatMap { case (attr, k) =>
      w.windowExpressions match {
        case Seq(alias @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(ps, os,
                SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _))
            if alias.exprId == attr.exprId && k >= 1 && k <= Int.MaxValue && os.nonEmpty =>
          // an already-inferred WindowGroupLimit below is subsumed
          val base = w.child match {
            case wgl: WindowGroupLimit => wgl.child
            case c => c
          }
          val rank = AttributeReference("__graft_rnk", LongType, nullable = false)()
          val topk = TopKPerKeyNode(ps, os, k.toInt, rank, base)
          // keep the original output: same attribute ids, same
          // IntegerType rank the row_number alias carried
          Some(Project(
            base.output :+ Alias(Cast(rank, IntegerType), alias.name)(alias.exprId),
            topk))
        case _ => None
      }
    }
}
