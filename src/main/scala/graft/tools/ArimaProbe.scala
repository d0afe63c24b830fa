package graft.tools
import graft.GraftSession
object ArimaProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "arima-probe")
    val d = "/root/testdata/sf0.1"
    (1 to 6).foreach { i =>
      val t0 = System.nanoTime()
      graft.forecast.ForecastJobs.arimaJob(spark, d).write.mode("overwrite").parquet("/tmp/arima_probe_out")
      println(f"pass $i: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
