package graft.tools

import graft.GraftSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Stage-level profile of [[graft.dedup.Dedup.dedupPpjoinPairs]] on the
  * StressR9 decorrelated corpus — finds the superlinear term the r9
  * stress exposed (15.6 s at mult=10 → 335 s at mult=100, 21× for 10×
  * data) by MEASURING per-stage duration, shuffle bytes, and spill
  * instead of guessing. Env: SPARK_GRAFT_STRESS_MULTS (default "10"),
  * SPARK_GRAFT_SHUFFLE_PARTS to override the session's 32.
  */
object ProfilePpjoin {

  private final case class StageRow(
      id: Int, name: String, secs: Double, tasks: Int,
      inputMb: Long, shReadMb: Long, shWriteMb: Long,
      spillMemMb: Long, spillDiskMb: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mults = sys.env.getOrElse("SPARK_GRAFT_STRESS_MULTS", "10")
      .split(",").map(_.trim.toInt).toSeq
    val spark = GraftSession.local(32, "graft-profile-ppjoin")
    sys.env.get("SPARK_GRAFT_SHUFFLE_PARTS")
      .foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))
    import spark.implicits._

    val stages = ArrayBuffer.empty[StageRow]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m  = si.taskMetrics
        val mb = (b: Long) => b >> 20
        stages += StageRow(
          si.stageId, si.name.takeWhile(_ != '\n').take(60),
          (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3,
          si.numTasks,
          mb(m.inputMetrics.bytesRead),
          mb(m.shuffleReadMetrics.totalBytesRead),
          mb(m.shuffleWriteMetrics.bytesWritten),
          mb(m.memoryBytesSpilled), mb(m.diskBytesSpilled))
      }
    })

    val work  = java.nio.file.Files.createTempDirectory("graft-prof-ppjoin").toString
    val docs  = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()

    for (mult <- mults) {
      docs
        .crossJoin(spark.range(mult).select($"id".as("rep")))
        .select(
          ($"doc_id" + $"rep" * nDocs).as("doc_id"),
          array_join(transform(split($"text", " "), w => concat(w, lit("_"), $"rep")), " ")
            .as("text"),
          $"source", $"n_chars", $"lang")
        .repartition(64)
        .write.mode("overwrite").parquet(s"$work/documents.parquet")

      stages.clear()
      val t0 = System.nanoTime()
      val n  = graft.dedup.Dedup.dedupPpjoinPairs(spark, work).count()
      val t  = (System.nanoTime() - t0) / 1e9
      println(f"== mult=$mult: $n pairs in $t%.1f s, parts=" +
        spark.conf.get("spark.sql.shuffle.partitions"))
      println("  stage  secs  tasks   inMB  shRdMB  shWrMB  spillM  spillD  name")
      stages.sortBy(-_.secs).take(14).foreach { s =>
        println(f"  ${s.id}%5d ${s.secs}%6.1f ${s.tasks}%6d ${s.inputMb}%6d " +
          f"${s.shReadMb}%7d ${s.shWriteMb}%7d ${s.spillMemMb}%7d ${s.spillDiskMb}%7d  ${s.name}")
      }
    }

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    spark.stop()
  }
}
