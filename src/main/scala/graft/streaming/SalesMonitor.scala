package graft.streaming

import graft.syntax._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The "Quittin Time" streaming workload the reference *describes* but
  * never implements (`/root/reference/README.md:19-20`: continuously
  * monitor sales, forecast the next 30 minutes), plus the streaming
  * replacement for the hand-rolled config.yml watermark (S10,
  * `square_ETL.py:20-22,53-56`).
  *
  * Structure: source → event-time watermark → 30-minute tumbling window
  * aggregation; checkpointing gives exactly the incremental/offset
  * semantics the reference maintained by hand, and the watermark bounds
  * state for late data (the reference's wall-clock range reprocessing
  * had no late-data story at all).
  *
  * Scale: state is (window × market) — tiny; throughput is bounded by the
  * source. A 100 TB/day firehose shards the source (Kafka partitions);
  * the windowed agg is a streaming partial-agg with the same shuffle key.
  */
object SalesMonitor {

  /** 30-minute tumbling sales per market with a 1-hour watermark.
    * Input schema: (created_at timestamp, market string, dollars double).
    */
  def windowedSales(payments: DataFrame): DataFrame =
    payments
      .withWatermark("created_at", "1 hour")
      .groupBy(window($"created_at", "30 minutes").as("w"), $"market")
      .agg(
        // DECIMAL(18,2) so the reduction is order-free across micro-batch
        // boundaries — raw double partials merge in arrival order and can
        // drift a ulp from the batch golden (same ADR as StreamQueries)
        sum($"dollars".cast("decimal(18,2)")).cast("double").as("dollars"),
        count(lit(1)).as("n_payments")
      )
      .select($"w.start".as("window_start"), $"w.end".as("window_end"), $"market", $"dollars", $"n_payments")

  final case class Payment(created_at: java.sql.Timestamp, market: String, dollars: Double)
  final case class MarketState(total: Double, n: Long)
  final case class MarketRunning(market: String, total_dollars: Double, n_payments: Long)

  /** Custom stateful operator — running per-market totals via
    * mapGroupsWithState (the KeyValueGroupedDataset path of the brief):
    * the forecast seed for "sales in the next 30 min" style monitoring.
    */
  def runningTotals(spark: SparkSession, payments: DataFrame): DataFrame = {
    import spark.implicits._
    payments
      .as[Payment]
      .groupByKey(_.market)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (market: String, rows: Iterator[Payment], state: GroupState[MarketState]) =>
          val prev  = state.getOption.getOrElse(MarketState(0.0, 0L))
          var total = prev.total
          var n     = prev.n
          rows.foreach { p => total += p.dollars; n += 1 }
          state.update(MarketState(total, n))
          MarketRunning(market, total, n)
      }
      .toDF()
  }

  final case class ForecastState(
      windowStart: Long,          // epoch seconds of the open window
      runningSum: Double,         // sales inside the open window
      level: Option[Double],      // SES level over CLOSED windows
      lateDropped: Long           // events older than the open window, dropped
  )
  final case class WindowForecast(
      market: String,
      window_start: java.sql.Timestamp,
      actual_dollars: Double,
      next_window_forecast: Double,
      late_dropped: Long // cumulative late events dropped for this market
  )

  /** The reference README's aspirational workload made real: per-market
    * SES forecast of the NEXT 30-minute window, maintained incrementally
    * by a stateful operator. Each closed window's total updates the SES
    * level (α = 0.6, the reference's fixed smoothing, `lib.py:84`); the
    * emitted forecast for the next window is the current level. State per
    * market is four numbers — O(markets) state at any throughput.
    *
    * Late data (ADVICE round 1): an event whose window is OLDER than the
    * open window (arrived after that window already closed and fed the
    * SES level) is DROPPED and counted in state, never silently folded
    * into the wrong open window. Pair with `withWatermark` upstream to
    * bound how late that can happen.
    */
  def forecastNext(spark: SparkSession, payments: DataFrame, alpha: Double = 0.6): DataFrame = {
    import spark.implicits._
    val windowSec = 1800L
    // dedicated uninitialized sentinel: a `windowStart < 0` check would
    // conflate "no state yet" with legitimate pre-1970 windows and reset
    // the running sum on every event (r3 self-review)
    val Uninit = Long.MinValue
    payments
      .as[Payment]
      .groupByKey(_.market)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (market: String, rows: Iterator[Payment], state: GroupState[ForecastState]) => {
          val sorted = rows.toArray.sortBy(_.created_at.getTime)
          var st = state.getOption.getOrElse(ForecastState(Uninit, 0.0, None, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[WindowForecast]
          sorted.foreach { p =>
            // floorDiv: negative epochs bucket to their window START
            val ws = Math.floorDiv(p.created_at.getTime, windowSec * 1000L) * windowSec
            if (st.windowStart == Uninit) st = ForecastState(ws, 0.0, st.level, st.lateDropped)
            if (ws < st.windowStart) {
              // late event for an already-closed window: drop + count
              st = st.copy(lateDropped = st.lateDropped + 1)
            } else {
              while (st.windowStart < ws) {
                // close the open window: fold its total into the SES level
                val closedTotal = st.runningSum
                val newLevel = st.level match {
                  case Some(l) => alpha * closedTotal + (1 - alpha) * l
                  case None    => closedTotal
                }
                out += WindowForecast(
                  market,
                  new java.sql.Timestamp(st.windowStart * 1000),
                  closedTotal,
                  newLevel, // forecast for the next window
                  st.lateDropped
                )
                st = ForecastState(st.windowStart + windowSec, 0.0, Some(newLevel), st.lateDropped)
              }
              st = st.copy(runningSum = st.runningSum + p.dollars)
            }
          }
          state.update(st)
          out.iterator
        }
      )
      .toDF()
  }

  /** Batch-mode equivalence shape: LITERALLY [[windowedSales]] applied
    * to a static frame (withWatermark is a documented no-op on batch
    * DataFrames), so the golden result StreamingSpec converges against
    * shares the streaming plan by construction instead of by a
    * hand-maintained copy (r11 review: the duplicated agg body could
    * silently drift from the streaming one and invalidate the gate).
    */
  def windowedSalesBatch(payments: DataFrame): DataFrame =
    windowedSales(payments)
}
