package graft.etl

import graft.SparkSpec
import java.nio.file.Files

/** S7/S8/S10 integration: the incremental batch flow — watermark scan →
  * append → watermark commit — and the crash-duplicate hazard the
  * reference carries (SURVEY §3.1 step 5) closed by appendDedup.
  */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-wh").toString

  test("dynamic partition overwrite rewrites only the touched partitions") {
    val dir = tmp() + "/fact"
    Warehouse.overwritePartitions(
      Seq((1, "2024-01-01", "a"), (2, "2024-01-02", "b"), (3, "2024-01-03", "c"))
        .toDF("id", "dt", "v"),
      dir,
      "dt"
    )
    // replay day 2 with corrected data; days 1 and 3 must survive
    Warehouse.overwritePartitions(
      Seq((9, "2024-01-02", "b2")).toDF("id", "dt", "v"),
      dir,
      "dt"
    )
    val rows = spark.read
      .parquet(dir)
      .select("id", "v")
      .collect()
      .map(r => (r.getInt(0), r.getString(1)))
      .toSet
    assert(rows == Set((1, "a"), (9, "b2"), (3, "c")))
    // idempotent: running the same day again changes nothing
    Warehouse.overwritePartitions(
      Seq((9, "2024-01-02", "b2")).toDF("id", "dt", "v"),
      dir,
      "dt"
    )
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("append accumulates, overwrite replaces") {
    val dir = tmp() + "/t"
    Warehouse.append(Seq((1, "a")).toDF("id", "v"), dir)
    Warehouse.append(Seq((2, "b")).toDF("id", "v"), dir)
    assert(spark.read.parquet(dir).count() == 2)
    Warehouse.overwrite(Seq((9, "z")).toDF("id", "v"), dir)
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("appendDedup makes re-extraction idempotent (at-least-once → effectively-once)") {
    val dir = tmp() + "/t"
    val batch = Seq(("p1", 10.0), ("p2", 20.0)).toDF("payment_id", "dollars")
    Warehouse.appendDedup(spark, batch, dir, "payment_id")
    // crash-before-watermark-commit replays the same batch plus one new row
    val replay = Seq(("p1", 10.0), ("p2", 20.0), ("p3", 30.0)).toDF("payment_id", "dollars")
    Warehouse.appendDedup(spark, replay, dir, "payment_id")
    val out = spark.read.parquet(dir).collect()
    assert(out.length == 3)
    assert(out.map(_.getString(0)).sorted.toSeq == Seq("p1", "p2", "p3"))
  }

  test("appendDedup keys are batch-membership keys: multi-row keys land whole, replay drops whole") {
    // detail tables key on their HEADER id — one order's many line rows
    // must all land in one batch, and a replayed order must drop them
    // all (r11 review pinned this contract; collapsing rows per key
    // would silently eat detail lines)
    val dir = tmp() + "/t"
    val batch = Seq(("o1", "line1"), ("o1", "line2"), ("o2", "line1")).toDF("order_id", "item")
    Warehouse.appendDedup(spark, batch, dir, "order_id")
    assert(spark.read.parquet(dir).count() == 3)
    // replay of o1 plus a new order: o1's rows drop wholesale, o3 lands
    val replay = Seq(("o1", "line1"), ("o1", "line2"), ("o3", "line1")).toDF("order_id", "item")
    Warehouse.appendDedup(spark, replay, dir, "order_id")
    val out = spark.read.parquet(dir).collect()
    assert(out.length == 4)
    assert(out.count(_.getString(0) == "o1") == 2)
  }

  test("compaction rewrites many small files into the target count, content preserved") {
    val dir = tmp() + "/t"
    (1 to 20).foreach(i => Warehouse.append(Seq((i, s"v$i")).toDF("id", "v"), dir))
    val filesBefore = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(filesBefore >= 20)
    val out = tmp() + "/compacted"
    Warehouse.compact(spark, dir, out, targetFiles = 2)
    val filesAfter = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(filesAfter == 2)
    assert(spark.read.parquet(out).collect().map(_.getInt(0)).sorted.toSeq == (1 to 20))
  }

  test("existence checks go through the Hadoop FileSystem API (explicit file: URI)") {
    // java.io.File cannot resolve a file:// URI path string — the Hadoop
    // FileSystem API must be in the path for hdfs:/s3a: portability
    val dir = "file://" + tmp() + "/t"
    assert(!Warehouse.pathExists(spark, dir))
    Warehouse.append(Seq((1, "a")).toDF("id", "v"), dir)
    assert(Warehouse.pathExists(spark, dir))
    assert(!new java.io.File(dir).exists(), "URI form must not be java.io-resolvable")
    // appendDedup sees the existing table through the same API
    Warehouse.appendDedup(spark, Seq((1, "a"), (2, "b")).toDF("id", "v"), dir, "id")
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("kill between load and watermark commit: replay is effectively-once") {
    val data = tmp() + "/t"
    val wm   = tmp() + "/wm"
    val t1   = java.sql.Timestamp.valueOf("2019-06-09 00:00:00")
    val b1   = Seq(("p1", 10.0), ("p2", 20.0)).toDF("payment_id", "dollars")
    // crash scenario: the data append lands, the watermark write never runs
    Warehouse.appendDedup(spark, b1, data, "payment_id")
    assert(Warehouse.readWatermark(spark, wm, "square").isEmpty)
    // restart: watermark still old → the SAME source window is re-read
    // (plus rows that arrived since); ingestBatch must not duplicate
    val b2 = Seq(("p1", 10.0), ("p2", 20.0), ("p3", 30.0)).toDF("payment_id", "dollars")
    Warehouse.ingestBatch(spark, b2, data, "payment_id", wm, "square", t1)
    val out = spark.read.parquet(data).collect()
    assert(out.length == 3)
    assert(out.map(_.getString(0)).sorted.toSeq == Seq("p1", "p2", "p3"))
    assert(Warehouse.readWatermark(spark, wm, "square").contains(t1))
  }

  test("audited ingest: per-load rows_landed as data, replay lands a truthful 0-row line") {
    val root = tmp()
    val (data, wm, audit) = (s"$root/t", s"$root/wm", s"$root/audit")
    def land(rows: Seq[(Int, String)], hwm: String): Long =
      Warehouse.ingestBatchAudited(
        spark, rows.toDF("id", "v"), data, "id", wm, "p1",
        java.sql.Timestamp.valueOf(hwm), audit)
    assert(land(Seq(1 -> "a", 2 -> "b"), "2024-01-02 00:00:00") == 2L)
    assert(land(Seq(3 -> "c"), "2024-01-03 00:00:00") == 1L)
    // crash replay of window 2: dedup drops it; the audit must SAY so
    assert(land(Seq(3 -> "c"), "2024-01-03 00:00:00") == 0L)
    val a = spark.read.parquet(audit)
      .orderBy($"high_water_mark", $"rows_landed".desc)
      .select($"pipeline", $"rows_landed").as[(String, Long)].collect().toSeq
    assert(a == Seq(("p1", 2L), ("p1", 1L), ("p1", 0L)))
    assert(spark.read.parquet(data).count() == 3)
    // watermark advanced with the last load
    assert(Warehouse.readWatermark(spark, wm, "p1")
      .contains(java.sql.Timestamp.valueOf("2024-01-03 00:00:00")))
  }

  test("rollbackWatermark rewrites the table so an older mark governs again") {
    val dir = tmp() + "/wm"
    val t1  = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val t2  = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
    Warehouse.writeWatermark(spark, dir, "events", t1)
    Warehouse.writeWatermark(spark, dir, "events", t2)
    Warehouse.writeWatermark(spark, dir, "other", t2)
    // append+MAX semantics: writing an older mark does NOT roll back
    Warehouse.writeWatermark(spark, dir, "events", t1)
    assert(Warehouse.readWatermark(spark, dir, "events").contains(t2))
    // the explicit maintenance path does — and only for the named pipeline
    Warehouse.rollbackWatermark(spark, dir, "events", t1)
    assert(Warehouse.readWatermark(spark, dir, "events").contains(t1))
    assert(Warehouse.readWatermark(spark, dir, "other").contains(t2))
  }

  test("watermark table roundtrip keeps the high-water mark per pipeline") {
    val dir = tmp() + "/wm"
    assert(Warehouse.readWatermark(spark, dir, "square").isEmpty)
    val t1 = java.sql.Timestamp.valueOf("2019-06-09 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2019-06-10 00:00:00")
    Warehouse.writeWatermark(spark, dir, "square", t1)
    Warehouse.writeWatermark(spark, dir, "shopify", t2)
    assert(Warehouse.readWatermark(spark, dir, "square").contains(t1))
    Warehouse.writeWatermark(spark, dir, "square", t2)
    assert(Warehouse.readWatermark(spark, dir, "square").contains(t2)) // latest wins
    assert(Warehouse.readWatermark(spark, dir, "shopify").contains(t2))
  }
}
