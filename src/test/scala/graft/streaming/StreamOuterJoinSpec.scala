package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.expr
import java.sql.Timestamp

/** Pins the outer-emission boundary the `s_stream_join_outer` oracle
  * replays: an unmatched left row's NULL-side result emits only once the
  * global watermark STRICTLY passes its join-window end (v_ts + 1 h) —
  * at equality the row is still in state.
  */
class StreamOuterJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("unmatched views emit null rows strictly below the watermark boundary") {
    implicit val sqlCtx = spark.sqlContext
    val views     = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val v = views.toDF().toDF("v_ts", "v_user", "v_id")
      .withWatermark("v_ts", "2 hours")
    val p = purchases.toDF().toDF("p_ts", "p_user", "p_id")
      .withWatermark("p_ts", "2 hours")
    val joined = v.join(
      p,
      expr("v_user = p_user AND p_ts >= v_ts AND p_ts <= v_ts + INTERVAL 1 HOUR"),
      "leftOuter"
    )
    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("ss_outer_out")
      .start()
    try {
      // final watermark will be min(11:00, 11:00) - 2h = 09:00
      views.addData(
        (ts("2019-06-09 06:00:00"), 1L, 100L), // end 07:00 <  09:00 → emits null row
        (ts("2019-06-09 07:59:59"), 2L, 101L), // end 08:59:59 < 09:00 → emits
        (ts("2019-06-09 08:00:00"), 3L, 102L), // end 09:00 == 09:00 → still in state
        (ts("2019-06-09 06:00:00"), 4L, 103L)  // matched → inner row, no null row
      )
      purchases.addData((ts("2019-06-09 06:30:00"), 4L, 200L))
      q.processAllAvailable()
      // advance both sides' watermarks, then run the eviction batch
      views.addData((ts("2019-06-09 11:00:00"), 9L, 999L))
      purchases.addData((ts("2019-06-09 11:00:00"), 9L, 998L))
      q.processAllAvailable()
      views.addData((ts("2019-06-09 11:00:00"), 9L, 997L))
      q.processAllAvailable()
      val out = spark.table("ss_outer_out")
        .select($"v_id", $"p_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet
      assert(out.contains((103L, 200L)), s"matched row missing: $out")
      assert(out.contains((100L, -1L)), s"clear-margin null row missing: $out")
      assert(out.contains((101L, -1L)), s"one-second-below null row missing: $out")
      assert(!out.exists(_._1 == 102L),
        s"boundary view (window end == watermark) must stay in state: $out")
    } finally q.stop()
  }
}
