package graft.plans

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.WindowExec

/** The one AQE-aware walk for partition-less WindowExec detection —
  * shared by the ScaleWindowSpec/SweeplineSpec plan gates and the
  * AuditWindows inventory tool (r10 review: the non-trivial adaptive
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
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case other                    => other.children
    }
    here ++ kids.flatMap(partitionless)
  }
}
