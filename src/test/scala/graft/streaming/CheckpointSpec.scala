package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** S10's real replacement: checkpointed incremental processing. A file
  * source consumed with `availableNow` + a checkpoint must process each
  * input file exactly once across query restarts — the property the
  * reference's config.yml watermark could not give (crash between load
  * and watermark commit ⇒ duplicates; SURVEY §3.1 step 5).
  */
class CheckpointSpec extends SparkSpec {
  import spark.implicits._

  test("file source + checkpoint: restart does not reprocess, new files are picked up") {
    val base = Files.createTempDirectory("graft-ckpt").toString
    val in   = s"$base/in"
    val out  = s"$base/out"
    val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()

    def writeBatch(name: String, rows: Seq[(Timestamp, String, Double)]): Unit =
      rows.toDF("created_at", "market", "dollars")
        .coalesce(1).write.mode("append").parquet(in)

    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("created_at timestamp, market string, dollars double")
        .parquet(in)
      val q = src.writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    val t0 = Timestamp.valueOf("2019-06-09 06:00:00")
    writeBatch("b1", Seq((t0, "m1", 10.0), (t0, "m2", 5.0)))
    runOnce()
    assert(spark.read.parquet(out).count() == 2)

    // restart with no new input: nothing reprocessed
    runOnce()
    assert(spark.read.parquet(out).count() == 2)

    // new file arrives: only it is processed
    writeBatch("b2", Seq((t0, "m1", 7.0)))
    runOnce()
    val rows = spark.read.parquet(out).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getDouble(2)).sorted.toSeq == Seq(5.0, 7.0, 10.0))
  }
}
