package graft.streaming

import graft.SparkSpec
import graft.syntax._

/** `s_stream_forecast` — the two-hop Quittin Time driver query: its
  * emitted forecast_next sequence must equal the batch SES kernel
  * ([[graft.forecast.Models.sesLevel]]) folded over each market's
  * finalized-window totals in window order, for every prefix.
  */
class StreamForecastSpec extends SparkSpec {

  test("forecast_next equals the batch SES prefix fold per market") {
    val rows = StreamQueries
      .streamForecast(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (market, rs) =>
      val ordered = rs.sortBy(_.getTimestamp(1).getTime)
      val totals  = ordered.map(_.getDouble(3))
      ordered.zipWithIndex.foreach { case (r, i) =>
        val want = graft.forecast.Models.sesLevel(totals.take(i + 1), StreamQueries.streamSesAlpha)
        assert(r.getDouble(5) == want, s"$market window $i: ${r.getDouble(5)} != $want")
      }
    }
  }

  test("hop-2 SES state persists across micro-batches (live window-close order)") {
    // the driver query replays bounded data in one AvailableNow batch;
    // a live deployment feeds hop 2 window-by-window as hop 1 finalizes
    // them — this pins that the level folds identically across batch
    // boundaries (state carries, no re-init)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits.{newStringEncoder, newProductEncoder, newLongEncoder, newDoubleEncoder}
    val mem = MemoryStream[StreamQueries.WinRow]
    val q = StreamQueries
      .sesOverWindows(mem.toDS())
      .toDF()
      .writeStream
      .format("memory")
      .queryName("sf_hop2_out")
      .outputMode(OutputMode.Append.toString.toLowerCase)
      .start()
    try {
      def w(i: Long, v: Double) =
        StreamQueries.WinRow(i * 1800000000L, (i + 1) * 1800000000L, "purchase", v, 1L)
      mem.addData(w(0, 10.0), w(1, 20.0))
      q.processAllAvailable()
      mem.addData(w(2, 40.0)) // state must carry the level from batch 1
      q.processAllAvailable()
      val got = spark.table("sf_hop2_out")
        .orderBy($"ws_us").collect().map(_.getDouble(5)).toSeq
      val a = StreamQueries.streamSesAlpha
      val l1 = 10.0
      val l2 = a * 20.0 + (1 - a) * l1
      val l3 = a * 40.0 + (1 - a) * l2
      assert(got == Seq(l1, l2, l3),
        s"SES level must fold across batches: $got vs ${Seq(l1, l2, l3)}")
    } finally {
      q.stop()
      spark.catalog.dropTempView("sf_hop2_out")
    }
  }

  test("the last hour's windows are withheld by the watermark cutoff") {
    val rows = StreamQueries.streamForecast(spark, sf0001).collect()
    val ev   = graft.tables.Tables.events(spark, sf0001)
    val maxTs = ev.agg(org.apache.spark.sql.functions.max($"ts")).head().getTimestamp(0)
    val cutoff = maxTs.getTime - 3600L * 1000L
    assert(rows.forall(_.getTimestamp(2).getTime <= cutoff),
      "a window newer than max(ts) - 1h leaked past the append-mode watermark")
  }
}
