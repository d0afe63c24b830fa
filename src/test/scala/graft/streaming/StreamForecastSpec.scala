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

  test("the last hour's windows are withheld by the watermark cutoff") {
    val rows = StreamQueries.streamForecast(spark, sf0001).collect()
    val ev   = graft.tables.Tables.events(spark, sf0001)
    val maxTs = ev.agg(org.apache.spark.sql.functions.max($"ts")).head().getTimestamp(0)
    val cutoff = maxTs.getTime - 3600L * 1000L
    assert(rows.forall(_.getTimestamp(2).getTime <= cutoff),
      "a window newer than max(ts) - 1h leaked past the append-mode watermark")
  }
}
