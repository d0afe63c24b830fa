package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** §2.10: MemoryStream-driven windowed aggregation with watermark +
  * late-data handling, and the stateful running-totals operator.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("30-min tumbling window with watermark aggregates and drops late data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("created_at", "market", "dollars")
    val q = SalesMonitor
      .windowedSales(df)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sales_out")
      .start()
    try {
      mem.addData(
        (ts("2019-06-09 06:10:00"), "Alameda Antique Faire", 12.0),
        (ts("2019-06-09 06:20:00"), "Alameda Antique Faire", 8.0),
        (ts("2019-06-09 06:40:00"), "Alameda Antique Faire", 5.0)
      )
      q.processAllAvailable()
      // advance watermark far past the first windows so they close
      mem.addData((ts("2019-06-09 09:00:00"), "Alameda Antique Faire", 1.0))
      q.processAllAvailable()
      // this event is 2.5h late — behind the watermark, must be dropped
      mem.addData((ts("2019-06-09 06:15:00"), "Alameda Antique Faire", 999.0))
      q.processAllAvailable()
      mem.addData((ts("2019-06-09 12:00:00"), "other", 2.0))
      q.processAllAvailable()
      val out = spark.table("sales_out").collect()
      val w0600 = out.find(_.getTimestamp(0) == ts("2019-06-09 06:00:00")).get
      assert(w0600.getDouble(3) == 20.0 && w0600.getLong(4) == 2) // 12+8, late 999 dropped
      val w0630 = out.find(_.getTimestamp(0) == ts("2019-06-09 06:30:00")).get
      assert(w0630.getDouble(3) == 5.0)
    } finally q.stop()
  }

  test("streaming windowed result converges to the batch-mode golden") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      (ts("2019-06-09 06:10:00"), "m1", 10.0),
      (ts("2019-06-09 06:20:00"), "m1", 20.0),
      (ts("2019-06-09 06:40:00"), "m2", 30.0),
      (ts("2019-06-09 07:10:00"), "m1", 40.0)
    )
    val golden = SalesMonitor
      .windowedSalesBatch(data.toDF("created_at", "market", "dollars"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(2)) -> (r.getDouble(3), r.getLong(4)))
      .toMap

    val mem = MemoryStream[(Timestamp, String, Double)]
    val q = SalesMonitor
      .windowedSales(mem.toDF().toDF("created_at", "market", "dollars"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sales_conv")
      .start()
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      mem.addData((ts("2019-06-09 23:00:00"), "flush", 0.0)) // close all windows
      q.processAllAvailable()
      val got = spark
        .table("sales_conv")
        .filter($"market" =!= "flush")
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(2)) -> (r.getDouble(3), r.getLong(4)))
        .toMap
      assert(got == golden)
    } finally q.stop()
  }

  test("stateful running totals accumulate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val q = SalesMonitor
      .runningTotals(spark, mem.toDF().toDF("created_at", "market", "dollars"))
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("running_out")
      .start()
    try {
      mem.addData((ts("2019-06-09 06:10:00"), "m1", 10.0))
      q.processAllAvailable()
      mem.addData((ts("2019-06-09 06:20:00"), "m1", 15.0), (ts("2019-06-09 06:21:00"), "m2", 7.0))
      q.processAllAvailable()
      val rows = spark.table("running_out").collect()
      val latestM1 = rows.filter(_.getString(0) == "m1").maxBy(_.getLong(2))
      assert(latestM1.getDouble(1) == 25.0 && latestM1.getLong(2) == 2)
      val m2 = rows.filter(_.getString(0) == "m2").maxBy(_.getLong(2))
      assert(m2.getDouble(1) == 7.0)
    } finally q.stop()
  }
}
