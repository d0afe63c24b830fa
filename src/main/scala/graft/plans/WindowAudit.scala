package graft.plans

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.WindowExec

/** The one AQE-aware walk for partition-less WindowExec detection —
  * shared by the ScaleWindowSpec/SweeplineSpec plan gates (r10 review:
  * the non-trivial adaptive
  * descent was maintained in three copies). TreeNode.collect stops at
  * QueryStageExec once AQE has re-planned, so adaptive wrappers are
  * descended explicitly.
  */
object WindowAudit {
  def partitionless(p: SparkPlan): Seq[WindowExec] = {
    val here = p match {
      case w: WindowExec if w.partitionSpec.isEmpty => Seq(w)
      case _                                        => Nil
    }
    here ++ kids(p).flatMap(partitionless)
  }

  private def kids(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case q: QueryStageExec        => Seq(q.plan)
    case other                    => other.children
  }

  import org.apache.spark.sql.execution.{CollectLimitExec, FilterExec, GlobalLimitExec,
    LocalLimitExec, ProjectExec, SortExec, TakeOrderedAndProjectExec}

  /** True when every row reaching `p` passed a LIMIT first: descends the
    * child chain through row-count-preserving-or-reducing UNARY nodes
    * only (sort/exchange/project/filter/codegen wrappers — NOT Generate,
    * which expands, and NOT joins/unions, where one limited side bounds
    * nothing), succeeding on the first limit-class node. This is what
    * makes `Ranking.topKRanked`'s rank window provably bounded: its
    * input is the ≤k-row output of a TakeOrderedAndProject.
    */
  def boundedInput(p: SparkPlan): Boolean = p match {
    case _: TakeOrderedAndProjectExec | _: GlobalLimitExec | _: CollectLimitExec |
        _: LocalLimitExec =>
      true
    case _: SortExec | _: ProjectExec | _: FilterExec |
        _: org.apache.spark.sql.execution.WholeStageCodegenExec |
        _: org.apache.spark.sql.execution.InputAdapter |
        _: org.apache.spark.sql.execution.exchange.Exchange |
        _: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec |
        _: org.apache.spark.sql.execution.CoalesceExec | _: AdaptiveSparkPlanExec |
        _: QueryStageExec =>
      kids(p) match {
        case Seq(one) => boundedInput(one)
        case _        => false
      }
    case _ => false
  }

  /** The gate predicate: partition-less windows whose input is NOT
    * provably bounded by a limit — the scale-killers. Bounded ones
    * (rank-after-top-k) single-task only k rows, which is the point.
    */
  def unbounded(p: SparkPlan): Seq[WindowExec] =
    partitionless(p).filterNot(w => boundedInput(w.child))
}
