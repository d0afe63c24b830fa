package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row

/** AQE on/off parity for the headline queries plus every query that
  * rides a custom operator (TopKPerKeyExec rewrite, salted skew join,
  * bloom runtime-filter prune): at fleet scale AQE re-plans exchanges at
  * runtime (partition coalescing, skew splitting, join-strategy swaps),
  * and a custom SparkPlan that mishandles a re-planned child would
  * silently change RESULTS, not just speed. The oracle gate runs one AQE
  * setting; this pins the other.
  *
  * Doubles are compared at 7 significant digits: AQE changes partition
  * counts and therefore float summation ORDER — ~1e-12 relative drift is
  * legitimate; anything at 1e-7 is a real divergence.
  */
class AqeParitySpec extends SparkSpec {

  private val names: Seq[String] =
    (graft.Bench.headline ++ Seq(
      "o_topk_sql_rewrite", // TopKRewrite → TopKPerKeyExec
      "j_salted_dim",       // SkewJoin.saltedInnerJoin
      "j_bloom_prune",      // bloom runtime filter
      "dedup_incremental_bloom",
      "w1_window_min"
    )).distinct

  private def canon(rows: Array[Row]): Seq[String] =
    rows.map { r =>
      (0 until r.length).map { i =>
        r.get(i) match {
          case null      => "∅"
          case d: Double => if (d.isNaN) "NaN" else f"$d%.6e"
          case f: Float  => if (f.isNaN) "NaN" else f"$f%.6e"
          case x         => x.toString
        }
      }.mkString("|")
    }.sorted.toSeq

  test("headline + custom-operator queries return identical rows with AQE off") {
    val conf = spark.conf
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val on =
        try canon(fn(spark, sf0001).collect())
        finally spark.catalog.clearCache()
      assert(conf.get("spark.sql.adaptive.enabled") == "true", "expected AQE on by default")
      conf.set("spark.sql.adaptive.enabled", "false")
      val off =
        try canon(fn(spark, sf0001).collect())
        finally {
          spark.catalog.clearCache()
          conf.set("spark.sql.adaptive.enabled", "true")
        }
      assert(on == off, s"$name: AQE on/off results diverge")
    }
  }
}
