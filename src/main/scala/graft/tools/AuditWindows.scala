package graft.tools

import graft.GraftSession
import graft.plans.WindowAudit

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

    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (name.startsWith("s_stream")) println(s"[skip ] $name (streaming)")
      else
        try {
          val df  = fn(spark, sfDir)
          val w   = WindowAudit.partitionless(df.queryExecution.sparkPlan)
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
