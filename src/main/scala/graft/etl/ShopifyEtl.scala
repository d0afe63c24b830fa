package graft.etl

import graft.syntax._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shopify ETL (`/root/reference/bin/etl/shopify_ETL.py`) — order JSON →
  * `shopify_trans` + `shopify_trans_details`.
  */
object ShopifyEtl {

  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(ZoloSchemas.shopifyOrder).json(path)

  /** F2 — explode line_items with string→number casts
    * (`shopify_ETL.py:106-130`); `shipping_lines[0].price` else null
    * (`:116-119`) via null-safe element_at. Numeric strings go through
    * try_cast (chaos r11 round 7): a live API ships non-numeric junk in
    * these fields, and an ANSI cast fails the whole job on the first one
    * — undefined values become null and propagate; fixture values all
    * parse, so the oracle row set is unchanged.
    */
  def details(raw: DataFrame): DataFrame =
    raw
      .select(
        $"id".cast("string").as("order_id"),
        $"created_at",
        try_element_at($"shipping_lines", lit(1))("price").try_cast("double").as("shipping_price"),
        explode($"line_items").as("li")
      )
      .select(
        $"order_id",
        $"created_at",
        $"shipping_price",
        $"li.variant_id".cast("string").as("shopify_id"),
        $"li.quantity".try_cast("int").as("quantity"),
        $"li.price".try_cast("double").as("price")
      )

  /** T1+T2, F8 subtotal = Σ quantity×price per order (`:151-159`), A2
    * multi-agg, F9 total = subtotal + shipping with null propagation
    * (`:160` — pandas NaN propagates; Spark `+` with null matches).
    */
  def headerTable(details: DataFrame): DataFrame =
    details
      // try_to_timestamp: same malformed-timestamp totality contract as
      // SquareEtl.withMarket (chaos r11 round 7)
      .withColumn("created_at_local", try_to_timestamp($"created_at") - expr("INTERVAL 7 HOURS"))
      .groupBy($"order_id", $"created_at_local".as("created_at"))
      .agg(
        min($"shipping_price").as("shipping_price"),
        sum($"quantity" * $"price").as("subtotal")
      )
      .withColumn("total_dollars", $"subtotal" + $"shipping_price") // F9
  def detailsTable(details: DataFrame): DataFrame =
    details.select($"order_id", $"shopify_id", $"quantity", $"price")

  def run(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val d = details(readRaw(spark, path))
    (headerTable(d), detailsTable(d))
  }
}
