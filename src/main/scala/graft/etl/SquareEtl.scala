package graft.etl

import graft.syntax._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Square ETL (`/root/reference/bin/etl/square_ETL.py`) — nested payment
  * JSON → `square_trans` + `square_trans_details`.
  *
  * The reference's per-payment Python loops (F1 explode `:115-156`, U2
  * concat `:159`) collapse into ONE lazy plan: explode + projections stay
  * in whole-stage codegen; the only exchanges are the W1 window partition
  * and the A1 aggregation — both on keys a 100 TB layout would be
  * partitioned by (date, payment_id).
  */
object SquareEtl {

  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(ZoloSchemas.squarePayment).json(path)

  /** F1 — one row per itemization; payment-level fields replicated
    * (`square_ETL.py:115-156`). F12 modifiers join with per-row null
    * semantics (sane per-row divergence from the reference's
    * all-or-nothing try/except quirk `:137-140` — documented in SURVEY
    * §2.2 F12). F10 cents→dollars `:128,132-133`.
    */
  def details(raw: DataFrame): DataFrame =
    raw
      .select(
        $"id".as("payment_id"),
        $"created_at",
        $"device.name".as("device_name"),
        try_element_at($"tender", lit(1)).as("tender1"),
        explode($"itemizations").as("it")
      )
      .select(
        $"payment_id",
        $"created_at",
        $"device_name",
        ($"tender1.tendered_money.amount".cast("long") / 100.0).as("tendered_cash"),
        ($"tender1.change_back_money.amount".cast("long") / 100.0).as("returned_cash"),
        $"it.item_detail.item_variation_id".as("square_id"),
        $"it.quantity".cast("int").as("quantity"),
        ($"it.total_money.amount".cast("long") / 100.0).as("dollars"),
        array_join(transform($"it.modifiers", m => m("name")), ";").as("modifiers"),
        $"it.item_variation_name".as("variation_name")
      )

  /** T1–T5 + W1 + F11 — timestamp parse, fixed −7h shift
    * (`square_ETL.py:175-181`), first-transaction-per-(date,device) window
    * (`:182`), market-attribution CASE cascade (`:185-190`, last-write-wins
    * order preserved; `== 07:00:00` exactly falls through to the Sunday
    * branch only when `> 7`... i.e. to 'other', as in the reference).
    */
  def withMarket(details: DataFrame): DataFrame = {
    // try_to_timestamp, not to_timestamp (chaos r11 round 7): a live API
    // ships malformed timestamps, and ANSI to_timestamp fails the whole
    // job on the first one — undefined rows carry a null local time
    // instead (their date/market derivations null-propagate). Fixture
    // timestamps all parse, so the oracle row set is unchanged.
    val local = try_to_timestamp($"created_at") - expr("INTERVAL 7 HOURS") // T1+T2
    val d     = details
      .withColumn("created_at_local", local)
      .withColumn("trans_date", to_date($"created_at_local")) // T3
      .withColumn("dow", weekday($"created_at_local"))        // T5, Mon=0
    val w = Window.partitionBy($"trans_date", $"device_name") // W1
    d.withColumn("first_trans", min($"created_at_local").over(w))
      .withColumn("market", marketCase($"dow", $"first_trans"))
  }

  /** The market-attribution cascade (`square_ETL.py:185-190`) — layered
    * np.where, later writes win ⇒ evaluated in reverse layer order as a
    * first-match CASE. ONE definition shared by the ETL and the
    * `w1_f11_market_attrib` verification query (r3 self-review: the
    * verifier previously carried a hand copy that a future boundary edit
    * could silently desynchronize).
    */
  def marketCase(dow: org.apache.spark.sql.Column, firstTrans: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(dow === 3, "San Rafael Thurs")
      .when(dow === 5, "Danville Farmers Market")
      .when(dow === 6 && date_format(firstTrans, "HH:mm:ss") < "07:00:00", "Alameda Antique Faire")
      .when(dow === 6 && date_format(firstTrans, "HH:mm:ss") > "07:00:00", "San Rafael Sunday")
      .otherwise("other")

  /** F5 — the detail-table projection (`square_ETL.py:193-201`). */
  def detailsTable(withMarket: DataFrame): DataFrame =
    withMarket.select(
      $"payment_id",
      $"square_id",
      $"quantity",
      $"dollars",
      $"modifiers",
      $"variation_name"
    )

  /** A1 — line items → payment header (`square_ETL.py:203-209`). */
  def headerTable(withMarket: DataFrame): DataFrame =
    withMarket
      .groupBy($"payment_id", $"created_at_local".as("created_at"), $"market")
      .agg(
        sum($"dollars").as("dollars"),
        min($"tendered_cash").as("tendered_cash"),
        min($"returned_cash").as("returned_cash")
      )

  /** Full pipeline: raw JSON path → (square_trans, square_trans_details). */
  def run(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val wm = withMarket(details(readRaw(spark, path)))
    (headerTable(wm), detailsTable(wm))
  }
}
