package graft.queries

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue interleaves bits: even positions from a, odd from b") {
    val r = spark
      .range(1)
      .select(
        ZOrder.zvalue(lit(3L), lit(1L)).as("z1"),      // 0b11 ⊕ 0b1 → 0b111
        ZOrder.zvalue(lit(0xFFFFL), lit(0L)).as("z2"), // even bits only
        ZOrder.zvalue(lit(0L), lit(0xFFFFL)).as("z3")  // odd bits only
      )
      .head()
    assert(r.getLong(0) == 7L)
    assert(r.getLong(1) == 0x55555555L)
    assert(r.getLong(2) == 0xAAAAAAAAL)
  }

  test("z-clustered files prune on both dimensions; single-key sort only on its own") {
    val ev = Tables
      .events(spark, sf0001)
      .select($"event_id", $"user_id", expr("unix_micros(ts) div 1000000").as("ts_s"))
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    ZOrder.writeZOrdered(ev, s"$dir/z", "user_id", "ts_s", files = 8)
    ev.repartitionByRange(8, $"user_id")
      .sortWithinPartitions($"user_id")
      .write
      .parquet(s"$dir/linear")

    // per-file min/max bounding boxes — what a stats-based planner sees
    def boxes(path: String): Array[Row] =
      spark.read
        .parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(
          min($"user_id").as("ulo"),
          max($"user_id").as("uhi"),
          min($"ts_s").as("tlo"),
          max($"ts_s").as("thi")
        )
        .collect()

    val b = ev.agg(min($"user_id"), max($"user_id"), min($"ts_s"), max($"ts_s")).head()
    val (umin, umax, tmin, tmax) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    // 10%-wide slices at the 20–30% point of each dimension (clear of the
    // top-bit boundary so the expected pruning pattern is stable)
    val (ulo, uhi) = (umin + (umax - umin) * 20 / 100, umin + (umax - umin) * 30 / 100)
    val (tlo, thi) = (tmin + (tmax - tmin) * 20 / 100, tmin + (tmax - tmin) * 30 / 100)

    def uHits(bs: Array[Row]) = bs.count(r => r.getLong(2) >= ulo && r.getLong(1) <= uhi)
    def tHits(bs: Array[Row]) = bs.count(r => r.getLong(4) >= tlo && r.getLong(3) <= thi)

    val zb = boxes(s"$dir/z")
    val lb = boxes(s"$dir/linear")

    // the layouts hold the same rows
    val zBack = spark.read.parquet(s"$dir/z").agg(count(lit(1)), sum($"event_id")).head()
    val src   = ev.agg(count(lit(1)), sum($"event_id")).head()
    assert(zBack.getLong(0) == src.getLong(0) && zBack.getLong(1) == src.getLong(1))

    // single-key sort: perfect on its own dimension, useless on the other
    assert(uHits(lb) <= 2)
    assert(tHits(lb) == lb.length)
    // z-order: prunes on BOTH dimensions — strictly better than the
    // linear layout on the off-sort dimension, and still selective on the
    // sorted one
    assert(tHits(zb) < tHits(lb))
    assert(tHits(zb) <= zb.length / 2)
    assert(uHits(zb) <= zb.length * 3 / 4)
  }
}
