package graft.etl

import org.apache.spark.sql.types._

/** Explicit schema-on-write for every payload and warehouse table —
  * the DDL-first spirit of the reference's `bin/create_tables` scripts
  * (`create_square_tables.py:16-38`, `create_shopify_tables.py:16-37`,
  * `create_quickbooks_tables.py:16-35`, `load_ref_tables.py:18-54`),
  * never `inferSchema` (SURVEY §1.2).
  */
object ZoloSchemas {

  // ---- raw API payloads (FIXTURES.md §1) ------------------------------

  /** Square payment (`/root/reference/bin/etl/square_ETL.py:120-140`). */
  val squarePayment: StructType = StructType(
    Seq(
      StructField("id", StringType),
      StructField("created_at", StringType),
      StructField("device", StructType(Seq(StructField("name", StringType)))),
      StructField(
        "itemizations",
        ArrayType(
          StructType(
            Seq(
              StructField("quantity", DoubleType),
              StructField("item_variation_name", StringType),
              StructField(
                "item_detail",
                StructType(Seq(StructField("item_variation_id", StringType)))
              ),
              StructField("total_money", StructType(Seq(StructField("amount", LongType)))),
              StructField(
                "modifiers",
                ArrayType(StructType(Seq(StructField("name", StringType))))
              )
            )
          )
        )
      ),
      StructField(
        "tender",
        ArrayType(
          StructType(
            Seq(
              StructField("tendered_money", StructType(Seq(StructField("amount", LongType)))),
              StructField("change_back_money", StructType(Seq(StructField("amount", LongType))))
            )
          )
        )
      )
    )
  )

  /** Shopify order (`shopify_ETL.py:108-119`); quantity/price arrive as
    * strings needing casts (`:113-115`).
    */
  val shopifyOrder: StructType = StructType(
    Seq(
      StructField("id", LongType),
      StructField("created_at", StringType),
      StructField(
        "line_items",
        ArrayType(
          StructType(
            Seq(
              StructField("quantity", StringType),
              StructField("variant_id", LongType),
              StructField("price", StringType)
            )
          )
        )
      ),
      StructField(
        "shipping_lines",
        ArrayType(StructType(Seq(StructField("price", StringType))))
      )
    )
  )

  /** QuickBooks invoice (`quickbooks_ETL.py:129-161`). */
  val qbInvoice: StructType = StructType(
    Seq(
      StructField("DocNumber", StringType),
      StructField("TxnDate", StringType),
      StructField("CustomerRef", StructType(Seq(StructField("value", StringType)))),
      StructField(
        "Line",
        ArrayType(
          StructType(
            Seq(
              StructField("Id", StringType),
              StructField(
                "SalesItemLineDetail",
                StructType(
                  Seq(
                    StructField("ItemRef", StructType(Seq(StructField("value", StringType)))),
                    StructField("Qty", DoubleType),
                    StructField("UnitPrice", DoubleType)
                  )
                )
              )
            )
          )
        )
      )
    )
  )

  /** QuickBooks customer (`qb_customers_ETL.py:121-131`). */
  val qbCustomer: StructType = StructType(
    Seq(
      StructField("Id", StringType),
      StructField("CompanyName", StringType),
      StructField("PrimaryPhone", StructType(Seq(StructField("FreeFormNumber", StringType)))),
      StructField(
        "ShipAddr",
        StructType(
          Seq(
            StructField("Line1", StringType),
            StructField("City", StringType),
            StructField("CountrySubDivisionCode", StringType),
            StructField("PostalCode", StringType)
          )
        )
      ),
      StructField("MetaData", StructType(Seq(StructField("CreateTime", StringType))))
    )
  )

  // ---- warehouse tables (SURVEY §1.3) ---------------------------------

  val squareTrans: StructType = StructType(
    Seq(
      StructField("payment_id", StringType),
      StructField("created_at", TimestampType),
      StructField("market", StringType),
      StructField("dollars", DoubleType),
      StructField("tendered_cash", DoubleType),
      StructField("returned_cash", DoubleType)
    )
  )

  val squareTransDetails: StructType = StructType(
    Seq(
      StructField("payment_id", StringType),
      StructField("square_id", StringType),
      StructField("quantity", IntegerType),
      StructField("dollars", DoubleType),
      StructField("modifiers", StringType),
      StructField("variation_name", StringType)
    )
  )

  val shopifyTrans: StructType = StructType(
    Seq(
      StructField("order_id", StringType),
      StructField("created_at", TimestampType),
      StructField("shipping_price", DoubleType),
      StructField("subtotal", DoubleType),
      StructField("total_dollars", DoubleType)
    )
  )

  val shopifyTransDetails: StructType = StructType(
    Seq(
      StructField("order_id", StringType),
      StructField("shopify_id", StringType),
      StructField("quantity", IntegerType),
      StructField("price", DoubleType)
    )
  )

  val qbTrans: StructType = StructType(
    Seq(
      StructField("payment_id", StringType),
      StructField("created_at", TimestampType),
      StructField("dollars", DoubleType),
      StructField("customer_id", StringType)
    )
  )

  val qbTransDetails: StructType = StructType(
    Seq(
      StructField("payment_id", StringType),
      StructField("quickbooks_id", StringType),
      StructField("quantity", IntegerType),
      StructField("price", DoubleType),
      StructField("dollars", DoubleType)
    )
  )

  val items: StructType = StructType(
    Seq(
      StructField("product_name", StringType),
      StructField("variant_name", StringType),
      StructField("zolo_id", IntegerType),
      StructField("square_id", StringType),
      StructField("quickbooks_id", StringType),
      StructField("shopify_id", StringType),
      StructField("category_name", StringType),
      StructField("form", StringType),
      StructField("weight", DoubleType),
      StructField("profile_id", IntegerType)
    )
  )

  val coffeeProfiles: StructType = StructType(
    Seq(
      StructField("profile_id", IntegerType),
      StructField("profile_name", StringType),
      StructField("roast_level", StringType),
      StructField("active", IntegerType),
      StructField("single_origin", IntegerType),
      StructField("c1_origin", StringType),
      StructField("c1_process", StringType),
      StructField("c1_percent", DoubleType),
      StructField("c2_origin", StringType),
      StructField("c2_process", StringType),
      StructField("c2_percent", DoubleType),
      StructField("c3_origin", StringType),
      StructField("c3_process", StringType),
      StructField("c3_percent", DoubleType)
    )
  )
}
