package graft.tools
import graft.GraftSession
import graft.dedup.Dedup
import graft.tables.Tables
object ProfileMh {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "profile-mh")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, d)
    for (i <- 1 to 4) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      Dedup.minhashPairs(docs, 0.5).count()
      println(f"[mh] run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
