package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Capture the r7 plan evidence for PLANS.md: the DSv2 REST scan with
  * its pushed range + pruned columns, and a bigram text plan with the
  * native WordBigrams generator inside whole-stage codegen.
  */
object DumpR7Plans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "dump-r7-plans")

    val srv = graft.sources.FixtureApiServer.shopifyAdmin(
      "/root/repo/fixtures/shopify_orders.json", user = "u", pass = "p")
    try {
      val df = graft.sources.RestQueries
        .shopifyDsv2Records(spark, srv.base, "u", "p",
          "2019-01-01T00:00:00Z", "2020-01-01T00:00:00Z", pageSize = 2)
        .select(col("id"), col("created_at"))
      df.collect()
      println("=== zolo-rest shopify scan ===")
      println(df.queryExecution.executedPlan.toString)
    } finally srv.stop()

    val pmi = graft.SparkEntry.queries("text_top_ngrams")(spark, "/root/testdata/sf0.001")
    pmi.collect()
    println("=== text_top_ngrams ===")
    println(pmi.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
