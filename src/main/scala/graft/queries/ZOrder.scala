package graft.queries

import graft.syntax._
import graft.tables.Tables
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-code) clustering — the multi-dimensional data-skipping
  * layout (Delta/Iceberg `ZORDER BY`), completing the storage-layout
  * repertoire next to bucketed (co-located joins), date-partitioned
  * (partition pruning) and single-key sorted (one-dimension min/max
  * skipping) writes in [[graft.etl.Warehouse]].
  *
  * Why it matters at 100 TB: a fact table sorted by one key skips row
  * groups only for predicates on THAT key — every other dimension's
  * min/max spans the whole file. Interleaving the bits of two dimension
  * ranks makes file boundaries axis-aligned boxes in (a, b) space, so
  * min/max statistics prune files for predicates on EITHER dimension
  * (ZOrderSpec measures exactly this on real parquet footers).
  *
  * Everything is built-in bit arithmetic — whole-stage codegen, no UDF —
  * and integer-exact, so the Morton codes are engine-independent and the
  * `layout_zorder` query is DuckDB-replayable hash-exact.
  */
object ZOrder {
  type Q = (SparkSession, String) => DataFrame

  /** Dilate the low 16 bits of `x` into the even bit positions of a
    * 32-bit value (magic-number bit spreading, 4 mask-shift rounds).
    * Every intermediate stays below 2³¹, so the chain is sign-safe and
    * overflow-free in any engine's signed 64-bit integers.
    */
  private def spread16(x: Column): Column = {
    val m = x.bitwiseAND(lit(0xFFFFL))
    val a = m.bitwiseOR(shiftleft(m, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit dimension ranks: `a` takes the even
    * bits, `b` the odd bits.
    */
  def zvalue(a16: Column, b16: Column): Column =
    spread16(a16).bitwiseOR(shiftleft(spread16(b16), 1))

  /** The per-batch 0..65535 rank of `x` within [lo, hi] — equal-width
    * normalization that gives each dimension the same weight in the
    * interleave regardless of natural magnitude (raw interleaving of a
    * 0..149 user id against an epoch in the 10⁹ range would let the
    * larger dimension own every significant bit). Exact integer
    * arithmetic: the ×65535 product runs in DECIMAL(38,0) — a long
    * multiply overflows (and under ANSI mode throws) once the dimension
    * span exceeds ~1.4e14, i.e. any epoch-micros column — and a double
    * division would not round-trip above 2⁵³. Dimensions must be
    * integral; bucket or scale doubles first.
    */
  private def rank16(x: String, lo: String, hi: String): Column =
    expr(s"(CAST(`$x` - `$lo` AS DECIMAL(38,0)) * 65535) div greatest(`$hi` - `$lo`, 1)")

  /** Oracle-checked Morton codes over events (user_id × epoch-second):
    * bounds → 16-bit ranks → bit interleave. The expensive part at scale
    * (the bounds pass) is one min/max agg — metadata-cheap on parquet —
    * broadcast back; everything after is map-only.
    */
  val layoutZorder: Q = (s, d) => {
    val ev = Tables
      .events(s, d)
      .select($"event_id", $"user_id", expr("unix_micros(ts) div 1000000").as("ts_s"))
    val bounds = ev.agg(
      min($"user_id").as("umin"),
      max($"user_id").as("umax"),
      min($"ts_s").as("tmin"),
      max($"ts_s").as("tmax")
    )
    ev.crossJoin(broadcast(bounds))
      .withColumn("u16", rank16("user_id", "umin", "umax"))
      .withColumn("t16", rank16("ts_s", "tmin", "tmax"))
      .select($"event_id", $"u16", $"t16", zvalue($"u16", $"t16").as("zvalue"))
      .orderBy($"event_id")
  }

  /** Z-clustered parquet writer: rank both dimensions, range-partition on
    * the Morton code (so each output file owns a compact z-range = a small
    * axis-aligned box in (a, b) space), sort within files for row-group-
    * level skipping, then drop the scaffolding columns.
    */
  def writeZOrdered(df: DataFrame, path: String, a: String, b: String, files: Int): Unit = {
    val bounds = df.agg(
      min(col(a)).as("__amin"),
      max(col(a)).as("__amax"),
      min(col(b)).as("__bmin"),
      max(col(b)).as("__bmax")
    )
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", zvalue(rank16(a, "__amin", "__amax"), rank16(b, "__bmin", "__bmax")))
      .repartitionByRange(files, $"__z")
      .sortWithinPartitions($"__z")
      .drop("__z", "__amin", "__amax", "__bmin", "__bmax")
      .write
      .mode(SaveMode.Overwrite)
      .parquet(path)
  }

  val queries: Map[String, Q] = Map(
    "layout_zorder" -> layoutZorder
  )

  // the Scala spread16 rounds replayed stage by stage; masks as decimal
  // literals: 0x00FF00FF = 16711935, 0x0F0F0F0F = 252645135,
  // 0x33333333 = 858993459, 0x55555555 = 1431655765
  val oracles: Map[String, String] = Map(
    "layout_zorder" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, (epoch_ns(ts) // 1000) // 1000000 AS ts_s FROM events),
        |b AS (
        |  SELECT min(user_id) AS umin, max(user_id) AS umax,
        |         min(ts_s) AS tmin, max(ts_s) AS tmax FROM ev),
        |n AS (
        |  SELECT event_id,
        |    ((user_id - umin) * 65535) // greatest(umax - umin, 1) AS u16,
        |    ((ts_s - tmin) * 65535) // greatest(tmax - tmin, 1) AS t16
        |  FROM ev, b),
        |s1 AS (SELECT event_id, u16, t16,
        |  (u16 | (u16 << 8)) & 16711935 AS ua, (t16 | (t16 << 8)) & 16711935 AS ta FROM n),
        |s2 AS (SELECT event_id, u16, t16,
        |  (ua | (ua << 4)) & 252645135 AS ub, (ta | (ta << 4)) & 252645135 AS tb FROM s1),
        |s3 AS (SELECT event_id, u16, t16,
        |  (ub | (ub << 2)) & 858993459 AS uc, (tb | (tb << 2)) & 858993459 AS tc FROM s2),
        |s4 AS (SELECT event_id, u16, t16,
        |  (uc | (uc << 1)) & 1431655765 AS ud, (tc | (tc << 1)) & 1431655765 AS td FROM s3)
        |SELECT event_id, u16, t16, ud | (td << 1) AS zvalue
        |FROM s4 ORDER BY event_id""".stripMargin
  )
}
