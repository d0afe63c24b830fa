package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streaming exact-dedup: dropDuplicatesWithinWatermark bounds dedup
  * state by event time — the streaming form of the exact-dedup operator
  * (state can't grow unboundedly at firehose scale).
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("duplicate payment ids within the watermark window are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val q = mem
      .toDF()
      .toDF("created_at", "payment_id", "dollars")
      .withWatermark("created_at", "1 hour")
      .dropDuplicatesWithinWatermark("payment_id")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("dedup_out")
      .start()
    try {
      mem.addData(
        (ts("2019-06-09 06:00:00"), "p1", 10.0),
        (ts("2019-06-09 06:05:00"), "p1", 10.0), // duplicate replay
        (ts("2019-06-09 06:10:00"), "p2", 20.0)
      )
      q.processAllAvailable()
      mem.addData((ts("2019-06-09 06:20:00"), "p1", 10.0)) // still duplicate
      q.processAllAvailable()
      mem.addData((ts("2019-06-09 12:00:00"), "p3", 5.0)) // advances watermark
      q.processAllAvailable()
      val out = spark.table("dedup_out").collect()
      assert(out.map(_.getString(1)).sorted.toSeq == Seq("p1", "p2", "p3"))
    } finally q.stop()
  }
}
