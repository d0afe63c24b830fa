package graft.tools

import graft.GraftSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.WindowExec

/** One-off audit: build EVERY driver query at the given SF and list the
  * partition-less WindowExec nodes in its pre-AQE physical plan — the
  * input for the ScaleWindowSpec whole-surface whitelist (queries whose
  * single-task window is calendar-/k-bounded by construction).
  */
object AuditWindows {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.local(16, "graft-audit-windows")
    spark.sparkContext.setLogLevel("ERROR")

    def windows(p: SparkPlan): Seq[WindowExec] = {
      val here = p match {
        case w: WindowExec if w.partitionSpec.isEmpty => Seq(w)
        case _                                        => Nil
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case other                    => other.children
      }
      here ++ kids.flatMap(windows)
    }

    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (name.startsWith("s_stream")) println(s"[skip ] $name (streaming)")
      else
        try {
          val df  = fn(spark, sfDir)
          val w   = windows(df.queryExecution.sparkPlan)
          if (w.nonEmpty)
            println(s"[WINDW] $name: ${w.size} partition-less — " +
              w.map(_.orderSpec.map(_.child.toString).mkString("+")).mkString(" | "))
          else println(s"[clean] $name")
          spark.catalog.clearCache()
        } catch { case e: Throwable => println(s"[err  ] $name: ${e.getMessage.take(100)}") }
    }
    spark.stop()
  }
}
