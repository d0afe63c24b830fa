package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Native session_window streaming aggregation — dynamic-gap windows
  * merging as events arrive (the streaming counterpart of the batch
  * w_sessionize query, which derives sessions with lag/cumsum). State is
  * one open session per key, closed by the watermark once the 10-minute
  * gap passes.
  */
class SessionWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("events within the gap merge into one session; a gap splits; watermark closes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val q = mem
      .toDF()
      .toDF("ts", "user_id", "value")
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window($"ts", "10 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"), sum($"value").as("total"))
      .select($"w.start".as("session_start"), $"w.end".as("session_end"),
        $"user_id", $"n_events", $"total")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("session_out")
      .start()
    try {
      mem.addData(
        (ts("2024-01-01 06:00:00"), 1L, 1.0),
        (ts("2024-01-01 06:05:00"), 1L, 2.0), // within gap → same session
        (ts("2024-01-01 06:30:00"), 1L, 4.0)  // > 10 min later → new session
      )
      q.processAllAvailable()
      // advance the watermark far enough to close both sessions
      mem.addData((ts("2024-01-01 09:00:00"), 2L, 9.0))
      q.processAllAvailable()
      val out = spark.table("session_out").collect()
        .map(r => (r.getTimestamp(0).toString.take(16), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      // session 1: 06:00–06:05 events merged (ends 06:15 = last + gap)
      assert(out.contains(("2024-01-01 06:00", 1L, 2L, 3.0)), out.mkString(";"))
      // session 2: the lone 06:30 event
      assert(out.contains(("2024-01-01 06:30", 1L, 1L, 4.0)), out.mkString(";"))
    } finally q.stop()
  }
}
