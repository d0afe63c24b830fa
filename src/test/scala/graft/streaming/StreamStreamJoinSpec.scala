package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.expr
import java.sql.Timestamp

/** Stream-stream interval join — the remaining §2.10 shape: payments
  * joined to their refunds arriving within 1 hour. Both sides are
  * watermarked so Spark bounds the join state (without watermarks the
  * buffered state grows forever at firehose scale); the interval
  * condition lets it evict a payment once its refund window has passed.
  */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("payments join refunds within a 1-hour event-time interval") {
    implicit val sqlCtx = spark.sqlContext
    val pays = MemoryStream[(Timestamp, String, Double)]
    val refs = MemoryStream[(Timestamp, String, Double)]
    val p = pays.toDF().toDF("pay_ts", "payment_id", "dollars")
      .withWatermark("pay_ts", "2 hours")
    val r = refs.toDF().toDF("ref_ts", "ref_payment_id", "refund")
      .withWatermark("ref_ts", "2 hours")
    val joined = p.join(
      r,
      expr("""payment_id = ref_payment_id AND
              ref_ts >= pay_ts AND ref_ts <= pay_ts + INTERVAL 1 HOUR""")
    )
    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("ss_join_out")
      .start()
    try {
      pays.addData(
        (ts("2019-06-09 06:00:00"), "p1", 10.0),
        (ts("2019-06-09 06:10:00"), "p2", 20.0),
        (ts("2019-06-09 06:20:00"), "p3", 30.0)
      )
      refs.addData(
        (ts("2019-06-09 06:30:00"), "p1", 10.0), // in window (30 min later)
        (ts("2019-06-09 08:30:00"), "p2", 20.0)  // too late (2h10m later)
      )
      q.processAllAvailable()
      val out = spark.table("ss_join_out").collect()
      assert(out.map(_.getString(1)).toSeq == Seq("p1"), out.mkString(";"))
      // late-window refund for p3 arrives in a later batch but still
      // inside the interval → matched incrementally from buffered state
      refs.addData((ts("2019-06-09 07:00:00"), "p3", 30.0))
      q.processAllAvailable()
      val out2 = spark.table("ss_join_out").collect()
      assert(out2.map(_.getString(1)).sorted.toSeq == Seq("p1", "p3"))
    } finally q.stop()
  }
}
