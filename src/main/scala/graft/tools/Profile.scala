package graft.tools

import graft.GraftSession
import graft.dedup.Dedup
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Ad-hoc profiling entry point (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "profile")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, d)
    time("shingles only")(docs.select(sum(size(Dedup.shingles(col("text"))))).collect())
    time("signatures")(Dedup.minhashSignatures(docs).count())
    val sigs = time("sigs collect")(Dedup.minhashSignatures(docs))
    val bands = (0 until Dedup.numBands)
      .map(b => sigs.select(col("doc_id"), lit(b).as("band_id"), col(s"band$b").as("band_hash")))
      .reduce(_ union _)
    time("bands")(bands.count())
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band_id") === col("b.band_id") && col("a.band_hash") === col("b.band_hash") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    time("candidates")(println("n_cand=" + cand.count()))
    time("full pairs")(Dedup.minhashPairs(docs, 0.5).count())
    time("simhash pairs")(Dedup.simhashPairs(docs, 3).count())
    spark.stop()
  }
}
