package graft.streaming

import graft.SparkSpec
import graft.queries.Cdc
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The standard Structured Streaming → warehouse sink idiom: foreachBatch
  * applies each micro-batch as a MERGE-style upsert ([[Cdc.mergeUpsert]])
  * into a keyed parquet table. Latest-write-wins per key; a replayed batch
  * (the at-least-once delivery case) must be a no-op because the upsert is
  * idempotent for identical payloads — this is what makes foreachBatch +
  * upsert effectively-once where a blind append sink is not.
  */
class StreamUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def readTable(path: String): DataFrame = spark.read.parquet(path)

  test("foreachBatch upsert: converges to last state per key, replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-upsert").toString
    val tbl = s"$dir/state.parquet"
    val src = MemoryStream[(Long, String, Int)]

    def applyBatch(batch: DataFrame, id: Long): Unit = {
      // within one batch, keep the last row per key (batch order is the
      // epoch's arrival order — seq gives it a deterministic stand-in)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"k").orderBy($"seq".desc)
      val latest = batch
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"k", $"v", $"seq")
      val merged =
        if (new java.io.File(tbl).exists())
          Cdc.mergeUpsert(readTable(tbl), latest, Seq("k"))
        else latest
      // read fully before overwrite: localCheckpoint materializes the
      // merge so the overwrite doesn't read the file it is replacing
      merged.localCheckpoint().write.mode("overwrite").parquet(tbl)
    }

    val q = src.toDF().toDF("k", "v", "seq")
      .writeStream
      .foreachBatch(applyBatch _)
      .option("checkpointLocation", s"$dir/ck")
      .start()
    try {
      src.addData((1L, "a", 1), (2L, "b", 2))
      q.processAllAvailable()
      src.addData((2L, "B", 3), (3L, "c", 4)) // update 2, insert 3
      q.processAllAvailable()
      val state = readTable(tbl).select($"k", $"v").as[(Long, String)].collect().sortBy(_._1)
      assert(state.toSeq == Seq((1L, "a"), (2L, "B"), (3L, "c")))

      // simulate an at-least-once redelivery of the same payload: applying
      // the same batch again must leave the table unchanged
      applyBatch(Seq((2L, "B", 3), (3L, "c", 4)).toDF("k", "v", "seq"), 99L)
      val replayed = readTable(tbl).select($"k", $"v").as[(Long, String)].collect().sortBy(_._1)
      assert(replayed.toSeq == state.toSeq, "replayed batch changed the table")
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("in-batch dedup keeps the LAST update for a key, not an arbitrary one") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-upsert2").toString
    val tbl = s"$dir/state.parquet"
    val src = MemoryStream[(Long, String, Int)]
    val q = src.toDF().toDF("k", "v", "seq")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"k").orderBy($"seq".desc)
        val latest = batch.withColumn("rn", row_number().over(w))
          .filter($"rn" === 1).select($"k", $"v", $"seq")
        val merged =
          if (new java.io.File(tbl).exists()) Cdc.mergeUpsert(readTable(tbl), latest, Seq("k"))
          else latest
        merged.localCheckpoint().write.mode("overwrite").parquet(tbl)
      }
      .option("checkpointLocation", s"$dir/ck")
      .start()
    try {
      // three updates to one key inside a single micro-batch
      src.addData((7L, "v1", 1), (7L, "v2", 2), (7L, "v3", 3))
      q.processAllAvailable()
      val rows = readTable(tbl).select($"k", $"v").as[(Long, String)].collect()
      assert(rows.toSeq == Seq((7L, "v3")))
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("s_stream_upsert fold is batching-independent: split replay == one-shot replay") {
    val ev = graft.tables.Tables.events(spark, sf0001)
    val b1 = ev.filter($"event_id" % 2 === 0)
    val b2 = ev.filter($"event_id" % 2 === 1)
    def norm(df: DataFrame) = df
      .orderBy($"user_id")
      .collect()
      .map(_.toSeq)
      .toSeq
    val split   = StreamQueries.upsertFold(Some(StreamQueries.upsertFold(None, b1)), b2)
    val oneShot = StreamQueries.upsertFold(None, ev)
    assert(norm(split) == norm(oneShot), "fold result depends on the batch split")
  }
}
