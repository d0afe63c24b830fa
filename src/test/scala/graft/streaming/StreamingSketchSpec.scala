package graft.streaming

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Sketches under Structured Streaming: because signature computation is
  * row-local map-only (no shuffle), the SAME minhash/simhash operators
  * run unchanged on a stream — the property that lets a 100 TB/day
  * firehose compute signatures at ingest and defer LSH joins to batch.
  */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  test("minhash signatures stream per micro-batch and match the batch computation") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = Dedup
      .minhashSignatures(mem.toDF().toDF("doc_id", "text"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sig_out")
      .start()
    try {
      val docs = Seq(
        (1L, "the quick brown fox jumps over the lazy dog near the gate"),
        (2L, "completely different text about catalyst plans and codegen stages")
      )
      mem.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("sig_out").collect()
        .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      val batch = Dedup.minhashSignatures(docs.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("simhash streams too (no stateful operators required)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = Dedup
      .simhash(mem.toDF().toDF("doc_id", "text"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sh_out")
      .start()
    try {
      mem.addData((7L, "alpha beta gamma delta epsilon zeta eta theta"))
      q.processAllAvailable()
      val streamed = spark.table("sh_out").collect().head.getLong(1)
      val batch = Dedup
        .simhash(Seq((7L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text"))
        .collect().head.getLong(1)
      assert(streamed == batch)
    } finally q.stop()
  }
}
