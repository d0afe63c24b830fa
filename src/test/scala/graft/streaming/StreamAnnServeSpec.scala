package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** IVF-routed streaming ANN serving: each probe micro-batch routes
  * through the cell-partitioned index; any batch split converges to the
  * batch index result because a probe's top-k lives entirely in its own
  * micro-batch.
  */
class StreamAnnServeSpec extends SparkSpec {
  import spark.implicits._

  test("two probe micro-batches converge to the batch ivfIndexTopK rows") {
    implicit val sqlCtx = spark.sqlContext
    val idxPath = java.nio.file.Files.createTempDirectory("graft-sann-idx").toString + "/idx"
    val out     = java.nio.file.Files.createTempDirectory("graft-sann-out").toString + "/hits"
    val cents   = graft.sim.Similarity.writeIvfIndex(spark, sf0001, idxPath, nCells = 16, iters = 3)

    val probeRows = graft.tables.Tables.embeddings(spark, sf0001)
      .filter($"vec_id" < 10)
      .select($"vec_id", org.apache.spark.sql.functions.transform(
        $"embedding", x => x.cast("double")).as("pv"))
      .as[(Long, Seq[Double])]
      .collect()

    val mem = MemoryStream[(Long, Seq[Double])]
    val q = mem.toDF().toDF("probe_id", "pv").writeStream
      .foreachBatch(StreamQueries.annServeBatchFn(idxPath, cents, out))
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      val (b1, b2) = probeRows.splitAt(5)
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
    } finally q.stop()

    def readOut() = spark.read.parquet(out).drop("batch")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted
    val streamed = readOut()
    val batch = graft.sim.Similarity.ivfIndexTopK(spark, sf0001, k = 5, nCells = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted
    assert(streamed.length == 50 && streamed.toSeq == batch.toSeq)

    // at-least-once retry: replaying a batchId must REPLACE its subdir,
    // not append beside it (foreachBatch redelivery after partial write)
    val replay = probeRows.take(5).toSeq
    val replayDf = replay.toDF("probe_id", "pv")
    StreamQueries.annServeBatchFn(idxPath, cents, out)(replayDf, 0L)
    assert(readOut().toSeq == streamed.toSeq, "batch retry duplicated sink rows")
  }
}
