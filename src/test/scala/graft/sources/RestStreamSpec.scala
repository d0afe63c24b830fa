package graft.sources

import graft.SparkSpec
import graft.etl.ZoloPipeline

/** The streaming face of zolo-rest: micro-batch incremental ingest with
  * checkpointed watermark offsets — the reference's S10 watermark-state
  * loop as a native Structured Streaming source. `option("clock", ...)`
  * pins each run's "now", so the windows are deterministic.
  */
class RestStreamSpec extends SparkSpec {

  private val begin = "2019-01-01T00:00:00Z"
  private val mid   = "2019-06-09T00:00:00Z"
  private val end   = "2020-01-01T00:00:00Z"

  private def withSquare[A](f: String => A): A = {
    val srv = FixtureApiServer.squareV1(
      s"${ZoloPipeline.fixturesDir}/square_payments.json",
      locationId = "LOC1", token = "sq-fixture-token", pageSize = 3, failFirst = 2)
    try f(s"${srv.base}/v1/LOC1/payments")
    finally srv.stop()
  }

  /** Run one incremental ingest pass into a parquet file sink (the
    * memory sink cannot recover from a checkpoint, and checkpoint
    * recovery IS the contract under test).
    */
  private def runStream(url: String, clock: String, checkpoint: String, outPath: String): Unit = {
    val q = spark.readStream
      .format("zolo-rest")
      .option("url", url)
      .option("token", "sq-fixture-token")
      .option("begin", begin)
      .option("clock", clock)
      .option("nslices", 2)
      .load()
      .writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  private def landed(outPath: String): Array[(String, String)] =
    spark.read.parquet(outPath).select("id", "created_at").collect()
      .map(r => (r.getString(0), r.getString(1)))

  test("first run lands [begin, clock); restart resumes the watermark — no refetch, only the new window") {
    withSquare { url =>
      val ckpt = java.nio.file.Files.createTempDirectory("zolo-rest-stream").toString
      val out  = java.nio.file.Files.createTempDirectory("zolo-rest-out").toString

      runStream(url, clock = mid, ckpt, out)
      val first = landed(out)
      assert(first.nonEmpty)
      assert(first.forall { case (_, ts) => ts >= begin && ts < mid }, first.mkString(","))

      // restart from the SAME checkpoint with the clock advanced: the
      // committed offset is mid, so only [mid, end) arrives — records
      // already landed are never fetched again
      runStream(url, clock = end, ckpt, out)
      val all    = landed(out)
      val second = all.filterNot(r => first.map(_._1).toSet.contains(r._1))
      assert(second.nonEmpty)
      assert(second.forall { case (_, ts) => ts >= mid && ts < end }, second.mkString(","))
      assert(all.length == first.length + second.length, "refetched a landed record")

      // union of the two incremental runs == one batch read of the full window
      val batch = RestQueries
        .squareDsv2Records(spark, url, "sq-fixture-token", begin, end, nSlices = 2)
        .select("id").collect().map(_.getString(0)).toSet
      assert(all.map(_._1).toSet == batch)
    }
  }

  test("a stale clock yields an idle stream, never a negative window") {
    withSquare { url =>
      val ckpt = java.nio.file.Files.createTempDirectory("zolo-rest-stream2").toString
      val out  = java.nio.file.Files.createTempDirectory("zolo-rest-out2").toString
      runStream(url, clock = mid, ckpt, out)
      val first = landed(out)
      // same checkpoint, same clock: latestOffset == committed offset
      runStream(url, clock = mid, ckpt, out)
      assert(landed(out).length == first.length, "stale clock must produce an empty batch")
    }
  }

  test("streaming without a begin watermark refuses with an actionable message") {
    withSquare { url =>
      val e = intercept[Exception] {
        val q = spark.readStream.format("zolo-rest")
          .option("url", url).option("token", "sq-fixture-token")
          .option("clock", end)
          .load()
          .writeStream.format("memory").queryName("stream_e").start()
        try q.processAllAvailable()
        finally q.stop()
      }
      def chain(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
      assert(chain(e).exists(c => Option(c.getMessage).exists(_.contains("initial ingest watermark"))),
        s"unexpected error: $e")
    }
  }

  test("count-then-pages entities stream too: shopify incremental ingest") {
    val srv = FixtureApiServer.shopifyAdmin(
      s"${ZoloPipeline.fixturesDir}/shopify_orders.json",
      user = "sh-key", pass = "sh-pass", failFirst = 2)
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("zolo-rest-stream3").toString
      val out  = java.nio.file.Files.createTempDirectory("zolo-rest-out3").toString
      val q = spark.readStream
        .format("zolo-rest")
        .option("entity", "shopify_orders")
        .option("url", srv.base).option("user", "sh-key").option("pass", "sh-pass")
        .option("begin", begin)
        .option("clock", end)
        .option("pagesize", 2)
        .load()
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      val got = spark.read.parquet(out).select("id").collect().map(_.getLong(0)).toSet
      val batch = RestQueries
        .shopifyDsv2Records(spark, srv.base, "sh-key", "sh-pass", begin, end, pageSize = 2)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == batch, s"stream landed $got, batch read $batch")
    } finally srv.stop()
  }

  test("latestOffset never regresses behind the committed watermark (clock step-back)") {
    val stale = "2019-03-01T00:00:00Z" // wall clock BEHIND the committed offset
    val stream = new ZoloRestMicroBatchStream(
      ZoloRestEntity("square_payments"),
      ZoloRestOptions("http://x", "", "", "", "", 2, 50, 1, 100, begin = begin, clock = stale),
      begin)
    // restart path: the checkpointed offset arrives via deserializeOffset
    stream.deserializeOffset(ZoloRestStreamOffset(mid).json())
    val latest = stream.latestOffset().asInstanceOf[ZoloRestStreamOffset].endTime
    assert(latest == mid,
      s"latestOffset must clamp to the committed watermark $mid, got $latest — " +
        "committing the regressed clock would re-ingest landed windows on recovery")
    assert(stream.planInputPartitions(ZoloRestStreamOffset(mid), stream.latestOffset()).isEmpty,
      "the clamped (empty) window must plan zero partitions")
  }

  test("qb_customers refuses to stream — a full refresh has no incremental watermark") {
    val e = intercept[Exception] {
      val q = spark.readStream.format("zolo-rest")
        .option("entity", "qb_customers")
        .option("url", "http://localhost:9").option("realm", "R").option("token", "t")
        .option("begin", begin).option("clock", end)
        .load()
        .writeStream.format("memory").queryName("qbc_refuse").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(e).exists(c => Option(c.getMessage).exists(_.contains("full-refresh dimension"))),
      s"unexpected error: $e")
  }

  test("offset json round-trips") {
    val off = ZoloRestStreamOffset("2019-07-01T00:00:00Z")
    val stream = new ZoloRestMicroBatchStream(
      ZoloRestEntity("square_payments"),
      ZoloRestOptions("http://x", "", "", "", "", 2, 50, 1, 100),
      begin)
    assert(stream.deserializeOffset(off.json()) == off)
  }
}
