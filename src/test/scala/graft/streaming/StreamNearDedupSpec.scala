package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming near-dup landing gate: per-bucket minimal-doc-id state via
  * flatMapGroupsWithState — near-dup flagging AT INGEST, the streaming
  * form of the MinHash-LSH candidate stage.
  */
class StreamNearDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill near the garden gate every single morning"
  private val other =
    "completely different content about spark catalyst optimizer rules and whole stage code generation for analytical queries at scale"

  private def runBatches(batches: Seq[(Long, String)]*): Map[Long, Long] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamQueries
      .nearDedupFlags(mem.toDF().toDF("doc_id", "text"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("near_dedup_out")
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table("near_dedup_out").collect()
        .groupBy(_.getLong(0))
        .map { case (id, rows) => id -> rows.map(_.getLong(1)).min }
    } finally {
      q.stop()
      spark.catalog.dropTempView("near_dedup_out")
    }
  }

  test("cross-batch state: a later exact dup is flagged against the batch-1 original") {
    val flags = runBatches(
      Seq((0L, base), (5L, other)),
      Seq((10L, base), (11L, base.replace("lazy", "sleepy"))) // exact + near dup of 0
    )
    assert(flags.get(10L).contains(0L), s"exact dup not flagged cross-batch: $flags")
    assert(flags.get(11L).contains(0L), s"near dup not flagged cross-batch: $flags")
    assert(!flags.contains(0L) && !flags.contains(5L), s"originals wrongly flagged: $flags")
  }

  test("streaming semantics: a smaller id arriving later does not retro-flag earlier docs") {
    val flags = runBatches(
      Seq((10L, base)),
      Seq((0L, base)) // smaller id, second batch
    )
    // doc 0 shares doc 10's buckets whose state min is 10 — but 10 < 0 is
    // false, so nothing is emitted for 0; and 10 was already processed
    assert(!flags.contains(10L) && !flags.contains(0L), s"retro-flagging happened: $flags")
  }

  test("within-batch determinism: flags fold in doc_id order, not arrival order") {
    val flags = runBatches(Seq((7L, base), (3L, base), (9L, base)))
    assert(flags.get(7L).contains(3L) && flags.get(9L).contains(3L) && !flags.contains(3L),
      s"in-batch min-rep rule broken: $flags")
  }

  test("unrelated docs share no bucket and produce no flags") {
    val flags = runBatches(Seq((1L, base), (2L, other)))
    assert(flags.isEmpty, s"false positives: $flags")
  }
}
