package graft.tools
import graft.GraftSession
object ProfileRb {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "profile-rb")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (i <- 1 to 3) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.queries.Relational.jRangeBinned(spark, d).count()
      println(f"[rb] run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
