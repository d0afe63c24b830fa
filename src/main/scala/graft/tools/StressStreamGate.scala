package graft.streaming
// lives in tools/ but sits in the streaming package: it drives the
// package-private nearDedupFlags transform directly so the micro-batch
// cadence is controlled by the harness, not by streamNearDedup's
// single-file driver shape.

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

/** 100× stress of the streaming near-dedup landing gate (judge r10 #7):
  * the suffix-decorrelated corpus (StressR9 build — vocabulary grows
  * mult×, per-token df stays base, so flag counts must scale ~mult×,
  * never mult²) staged as K parquet files and streamed
  * `maxFilesPerTrigger=1`, i.e. K REAL micro-batches through
  * flatMapGroupsWithState. Two claims pinned from the engine's own
  * progress events (not from our code's bookkeeping):
  *
  *  - state size: `stateOperators.numRowsTotal` must equal the occupied
  *    band-bucket count (distinct (band, hash) across the corpus) — one
  *    long per bucket, NEVER corpus-sized rows;
  *  - flag latency: per-micro-batch wall (batchDuration) stays flat-ish
  *    across batches — state growth must not degrade later batches.
  *
  * Output: markdown bullets for BENCH_LOCAL §r10.
  */
object StressStreamGate {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult  = sys.env.getOrElse("SPARK_GRAFT_STRESS_MULT", "100").toInt
    val parts = sys.env.getOrElse("SPARK_GRAFT_STRESS_BATCHES", "10").toInt
    val spark = GraftSession.local(32, "graft-stress-sgate")
    import spark.implicits._

    val work = java.nio.file.Files.createTempDirectory("graft-stress-sgate").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    docs
      .crossJoin(spark.range(mult).select($"id".as("rep")))
      .select(
        ($"doc_id" + $"rep" * nDocs).as("doc_id"),
        array_join(transform(split($"text", " "), w => concat(w, lit("_"), $"rep")), " ")
          .as("text"),
        $"source", $"n_chars", $"lang")
      // range-split on doc_id so each micro-batch is a contiguous id
      // window (the monotonic-ingest-id contract the gate documents)
      .repartitionByRange(parts, $"doc_id")
      .sortWithinPartitions($"doc_id")
      .write.mode("overwrite").parquet(s"$work/docs")
    // FileStreamSource orders files by MODIFICATION TIME, and parallel
    // write tasks commit in arbitrary order — restamp the range files
    // (part-00000 holds the lowest id range) with strictly increasing
    // mtimes so batch order follows doc_id order, honoring the gate's
    // monotonic-ingest-id contract (r10 review)
    new java.io.File(s"$work/docs").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
      .zipWithIndex
      .foreach { case (f, i) => f.setLastModified(1700000000000L + i * 60000L) }

    // ground truth for the state-size claim: occupied band buckets
    val corpus = spark.read.parquet(s"$work/docs")
    val occupiedBuckets = graft.dedup.Dedup
      .minhashSignatures(corpus)
      .select(posexplode(array((0 until graft.dedup.Dedup.numBands).map(b =>
        col(s"band$b")): _*)).as(Seq("band_id", "band_hash")))
      .distinct()
      .count()

    // listener events arrive on the bus thread — a concurrent queue plus
    // a size-stability poll below replaces the racy fixed sleep
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long, Long)]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        if (p.numInputRows > 0) {
          val state = p.stateOperators.map(_.numRowsTotal).sum
          batches.add((p.batchId, p.numInputRows, p.batchDuration, state))
        }
      }
    })

    val ck = java.nio.file.Files.createTempDirectory("graft-stress-sgate-ck").toString
    val src = spark.readStream
      .schema(corpus.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$work/docs")
    val t0 = System.nanoTime()
    val q = StreamQueries.nearDedupFlags(src).writeStream
      .format("memory").queryName("stress_sgate_sink").outputMode("append")
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val wall  = (System.nanoTime() - t0) / 1e9
    val flags = spark.table("stress_sgate_sink").select($"doc_id").distinct().count()
    // listener events are delivered async — poll until the queue is
    // stable for a full second (bounded at 30 s)
    var last = -1
    val deadline = System.nanoTime() + 30e9.toLong
    while (batches.size != last && System.nanoTime() < deadline) {
      last = batches.size; Thread.sleep(1000)
    }
    val rows = {
      import scala.jdk.CollectionConverters._
      batches.asScala.toSeq.sortBy(_._1)
    }
    println(
      f"- s_stream_near_dedup at ${nDocs * mult} docs (mult=$mult, ${rows.size} micro-batches): " +
        f"$flags flagged docs in $wall%.1f s; final state ${rows.lastOption.map(_._4).getOrElse(-1L)} " +
        f"rows vs $occupiedBuckets occupied band buckets (corpus rows: ${nDocs * mult} — state is " +
        "bucket-count-sized, not corpus-sized)")
    println("- per micro-batch (batchId, inputRows, batchDurationMs, stateRowsTotal): " +
      rows.map { case (b, r, d, s) => s"($b, $r, ${d}ms, $s)" }.mkString(" "))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ck))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    spark.stop()
  }
}
