package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated TPC-H-ish corpus (TESTDATA.md).
  *
  * Role mapping onto the reference warehouse (FIXTURES.md §5):
  * orders = fact header (square/shopify/qb_trans), lineitem = fact detail,
  * part = items dimension, supplier/nation = coffee_profiles, customer =
  * qb_customers, events = streaming source, documents/embeddings = the
  * LLM-pipeline corpus.
  *
  * All reads are bare `spark.read.parquet` so Catalyst sees a plain file
  * scan: filter pushdown, column pruning, and partition coalescing all
  * apply. At 100 TB these would be partitioned tables (orders/lineitem by
  * date), but the read API is identical.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** events.parquet's `ts` encoding has varied across driver testdata
    * generations, so the loader normalizes every variant to the session
    * TimestampType (UTC session zone — wall-clock values identical):
    *
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; with
    *    spark.sql.legacy.parquet.nanosAsLong=true (set by every graft
    *    session) it lands as a long we truncate to micros. Integer `div` —
    *    a double division would lose precision at ~1.7e18 ns.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
    *    TIMESTAMP_NTZ, which time-arithmetic built-ins (`unix_micros`,
    *    range frames over epoch micros) reject. Cast to TimestampType:
    *    under the UTC session zone the instant is the naive value read as
    *    UTC — exactly what the DuckDB oracle (naive timestamps) computes.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
