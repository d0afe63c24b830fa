package graft.etl

import graft.analytics.WeeklyDemand
import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end zolo flow on the bundled fixtures (FIXTURES.md §1–2):
  * the reference's whole warehouse — 4 ETLs → 8 tables → the weekly-demand
  * query — as one lazy-plan pipeline. Exposed through SparkEntry as
  * rows-only queries (the raw nested JSON has no DuckDB-oracle analog in
  * the driver corpus; correctness is locked by EtlSpec's golden
  * assertions).
  */
object ZoloPipeline {

  val fixturesDir = "/root/repo/fixtures"

  /** Register all 8 warehouse tables as temp views from the fixture data.
    * Idempotent per session — repeated driver queries skip re-planning the
    * whole ETL fixture read.
    */
  def registerAll(spark: SparkSession, dir: String = fixturesDir): Unit = {
    if (spark.catalog.tableExists("coffee_profiles")) return
    registerAllForce(spark, dir)
  }

  /** Unconditional registration (tests that mutate fixtures would use this). */
  def registerAllForce(spark: SparkSession, dir: String = fixturesDir): Unit = {
    // fixture tables are tiny: persist so the six driver queries and the
    // multi-branch weekly-demand plan don't re-run the JSON ETLs per use
    val (sqTrans, sqDetails) = SquareEtl.run(spark, s"$dir/square_payments.json")
    val (shTrans, shDetails) = ShopifyEtl.run(spark, s"$dir/shopify_orders.json")
    val (qbTrans, qbDetails) = QuickbooksEtl.run(spark, s"$dir/qb_invoices.json")
    sqTrans.coalesce(1).persist().createOrReplaceTempView("square_trans")
    sqDetails.coalesce(1).persist().createOrReplaceTempView("square_trans_details")
    shTrans.coalesce(1).persist().createOrReplaceTempView("shopify_trans")
    shDetails.coalesce(1).persist().createOrReplaceTempView("shopify_trans_details")
    qbTrans.coalesce(1).persist().createOrReplaceTempView("qb_trans")
    qbDetails.coalesce(1).persist().createOrReplaceTempView("qb_trans_details")
    QbCustomersEtl
      .run(spark, s"$dir/qb_customers.json")
      .persist()
      .createOrReplaceTempView("qb_customers")
    Warehouse.readItems(spark, s"$dir/items.csv").persist().createOrReplaceTempView("items")
    Warehouse
      .readCoffeeProfiles(spark, s"$dir/coffee_profiles.csv")
      .persist()
      .createOrReplaceTempView("coffee_profiles")
  }

  def weeklyDemand(spark: SparkSession): DataFrame = {
    registerAll(spark)
    WeeklyDemand.run(spark)
  }

  /** Rows-only driver queries: the sfDir argument is ignored — these run
    * on the bundled fixtures because the reference's nested payloads have
    * no analog in the TPC-H-ish corpus.
    */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "zolo_square_trans" -> ((s, _) => {
      registerAll(s); s.table("square_trans").orderBy("payment_id")
    }),
    "zolo_square_details" -> ((s, _) => {
      registerAll(s); s.table("square_trans_details").orderBy("payment_id", "square_id")
    }),
    "zolo_shopify_trans" -> ((s, _) => {
      registerAll(s); s.table("shopify_trans").orderBy("order_id")
    }),
    "zolo_qb_trans" -> ((s, _) => {
      registerAll(s); s.table("qb_trans").orderBy("payment_id")
    }),
    "zolo_qb_customers" -> ((s, _) => {
      registerAll(s); s.table("qb_customers").orderBy("customer_id")
    }),
    "zolo_weekly_demand" -> ((s, _) => weeklyDemand(s))
  )
}
