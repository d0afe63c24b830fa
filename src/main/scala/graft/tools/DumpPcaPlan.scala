package graft.tools

import graft.GraftSession

/** Print the PCA covariance stage's formatted plan (PLANS.md source). */
object DumpPcaPlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "dump-pca-plan")
    val df = graft.sim.Pca.covarianceFrame(spark, "/root/testdata/sf0.001")
    df.collect()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
