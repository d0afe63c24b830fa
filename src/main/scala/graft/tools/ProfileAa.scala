package graft.tools

import graft.GraftSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Per-stage breakdown of g_adamic_adar on a stress dir — the ×100
  * fleet-emulation run (512 shuffle partitions) kept a 265 s max task,
  * disproving the partition-granularity hypothesis; this pins WHICH
  * stage concentrates the work.
  */
object ProfileAa {
  def main(args: Array[String]): Unit = {
    val dir   = sys.env.getOrElse("SPARK_GRAFT_STRESS_DIR", "/tmp/graft_stress_r11c_x100")
    val spark = GraftSession.local(32, "graft-profile-aa")
    sys.env.get("SPARK_GRAFT_SHUFFLE_PARTS").foreach { p =>
      spark.conf.set("spark.sql.shuffle.partitions", p)
    }
    val taskMax  = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val taskCnt  = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val taskSum  = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        Option(te.taskMetrics).foreach { m =>
          taskMax.merge(te.stageId, m.executorRunTime, math.max(_, _))
          taskCnt.merge(te.stageId, 1L, _ + _)
          taskSum.merge(te.stageId, m.executorRunTime, _ + _)
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val mx = taskMax.getOrDefault(si.stageId, 0L) / 1e3
        if (mx > 5.0)
          println(f"- stage ${si.stageId}%4d tasks=${taskCnt.getOrDefault(si.stageId, 0L)}%4d " +
            f"maxTask=$mx%6.1f s sumTask=${taskSum.getOrDefault(si.stageId, 0L) / 1e3}%7.1f s  ${si.name.take(90)}")
      }
    })
    val (_, wall) = StressUtil.time {
      graft.SparkEntry.queries("g_adamic_adar")(spark, dir)
        .write.mode("overwrite").parquet("/tmp/graft_profile_aa_out")
    }
    Thread.sleep(2000)
    println(f"- total wall $wall%.1f s")
    spark.stop()
  }
}
