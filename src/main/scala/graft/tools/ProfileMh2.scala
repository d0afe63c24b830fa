package graft.tools

import graft.GraftSession
import graft.dedup.{Dedup, Hashing}
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Phase breakdown of the minhash LSH path (scratch profiling main). */
object ProfileMh2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "profile-mh2")
    import spark.implicits._
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[mh2] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, d)
    for (round <- 1 to 2) {
      spark.catalog.clearCache()
      println(s"[mh2] -- round $round --")
      time("sigs scan (UDF)")(Dedup.minhashSignatures(docs).count())
      val sigs = Dedup.minhashSignatures(docs)
      val allBands = sigs.select(
        $"doc_id",
        posexplode(array((0 until Dedup.numBands).map(b => col(s"band$b")): _*))
          .as(Seq("band_id", "band_hash")))
      time("bands + window cap")(
        Dedup.capBuckets(allBands, Seq("band_id", "band_hash"), Dedup.maxBucketSize).count())
      time("full minhashPairs")(Dedup.minhashPairs(docs, 0.5).count())
      val shUdf = udf { (text: String) => Hashing.shingleSet(text).toSeq }
      time("full-corpus shingle UDF (reference)")(docs.select(shUdf($"text")).count())
    }
    spark.stop()
  }
}
