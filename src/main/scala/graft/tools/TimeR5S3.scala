package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Steady-state timings for the round-5 session-3 queries at an arbitrary
  * SF (min of 2 passes, cold cache per query) — the sf0.1 evidence rows
  * behind BENCH_LOCAL's session-3 section. Usage:
  * `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.TimeR5S3 /root/testdata/sf0.1"`
  */
object TimeR5S3 {
  private val names = Seq(
    "m_croston", "m_seasonal_decomp", "m_acf", "m_hw_fixed", "m_trend_ols",
    "m_cusum", "m_inventory_sim", "w_merge_upsert", "e_scd2",
    "g_triangles", "g_hops", "text_oov_rate", "text_split_divergence",
    "a_histogram", "a_abc_class", "s_stream_join"
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      println(f"[time] $n%-22s ${ts.map(_._1).min}%8.2f s  rows=${ts.head._2}")
    }
    spark.stop()
  }
}
