package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** The 30-min-ahead streaming forecaster: SES level rolls forward as
  * windows close, across micro-batches.
  */
class ForecastStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("window closes fold into SES level; forecast = level") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val q = SalesMonitor
      .forecastNext(spark, mem.toDF().toDF("created_at", "market", "dollars"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("fc_out")
      .start()
    try {
      // window 06:00 gets 10+20=30, window 06:30 gets 40
      mem.addData(
        (ts("2019-06-09 06:05:00"), "m1", 10.0),
        (ts("2019-06-09 06:20:00"), "m1", 20.0),
        (ts("2019-06-09 06:40:00"), "m1", 40.0)
      )
      q.processAllAvailable()
      // next batch: event in window 07:30 closes 06:30 AND the empty 07:00
      mem.addData((ts("2019-06-09 07:40:00"), "m1", 5.0))
      q.processAllAvailable()
      val rows = spark
        .table("fc_out")
        .collect()
        .map(r => r.getTimestamp(1).toString.take(16) -> (r.getDouble(2), r.getDouble(3)))
        .toMap
      // first closed window: level = total = 30, forecast 30
      assert(rows("2019-06-09 06:00") == ((30.0, 30.0)))
      // second: level = .6*40 + .4*30 = 36
      assert(rows("2019-06-09 06:30") == ((40.0, 36.0)))
      // empty 07:00 window folds a zero: level = .6*0 + .4*36 = 14.4
      assert(rows("2019-06-09 07:00")._1 == 0.0)
      assert(math.abs(rows("2019-06-09 07:00")._2 - 14.4) < 1e-9)
      // a LATE event (older than the open 07:30 window) is dropped, not
      // folded into the wrong window — and the drop is OBSERVABLE via
      // late_dropped on the next emitted row
      mem.addData((ts("2019-06-09 06:10:00"), "m1", 999.0)) // late
      mem.addData((ts("2019-06-09 08:10:00"), "m1", 7.0))   // closes 07:30
      q.processAllAvailable()
      val after = spark.table("fc_out").collect()
        .map(r => r.getTimestamp(1).toString.take(16) ->
          (r.getDouble(2), r.getLong(4)))
        .toMap
      assert(after("2019-06-09 07:30")._1 == 5.0, "late dollars leaked into 07:30")
      assert(after("2019-06-09 07:30")._2 == 1L, "late drop not counted")
    } finally q.stop()
  }
}
