package graft.tools

import graft.GraftSession
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway diagnosis main for the pagerank round cost (optimization
  * round): times 10-round pagerank loops under controlled variants so
  * the ~13 s of per-round task CPU can be attributed (decimal sum?
  * string keys? cache scan? checkpoint?). Results of variants B-D are
  * NOT oracle-equivalent — timing probes only.
  */
object PrDebug {
  def main(args: Array[String]): Unit = {
    // bypassMergeThreshold below the partition count forces the
    // sort-based shuffle writer (1 data + 1 index file per map task)
    // instead of the bypass writer (R files per map task) — the path a
    // production >200-partition shuffle takes anyway.
    val bypass = sys.env.getOrElse("PR_BYPASS", "200")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .appName("pr-debug")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.shuffle.sort.bypassMergeThreshold", bypass)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = spark.sparkContext.defaultParallelism

    def strEdges(): DataFrame = {
      val pairs = Tables.lineitem(spark, d)
        .select(concat(lit("p"), $"l_partkey").as("p"), concat(lit("s"), $"l_suppkey").as("q"))
        .distinct()
      pairs.select($"p".as("src"), $"q".as("dst"))
        .unionAll(pairs.select($"q".as("src"), $"p".as("dst")))
    }
    // long node ids: part keys as-is, supplier keys offset into a disjoint range
    def longEdges(): DataFrame = {
      val pairs = Tables.lineitem(spark, d)
        .select($"l_partkey".cast("long").as("p"), ($"l_suppkey".cast("long") + 1000000000L).as("q"))
        .distinct()
      pairs.select($"p".as("src"), $"q".as("dst"))
        .unionAll(pairs.select($"q".as("src"), $"p".as("dst")))
    }

    def loop(label: String, el: DataFrame, decimalSum: Boolean, rounds: Int = 10,
             cutEvery: Int = 1): Unit = {
      val edges = el.repartition(cpus, col("src")).persist()
      val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg")).persist()
      val edgesDeg = edges.join(outdeg, "src").persist()
      val n = outdeg.count()
      edgesDeg.count()
      edges.unpersist()
      val jump = 0.15 / n
      var ranks = outdeg.select(col("src").as("node"), lit(1.0 / n).as("rank")).localCheckpoint()
      val t0 = System.nanoTime()
      for (r <- 1 to rounds) {
        val contribs = edgesDeg
          .join(ranks.withColumnRenamed("node", "src"), "src")
          .select(col("dst"), (col("rank") / col("outdeg")).as("contrib"))
        val summed =
          if (decimalSum) (lit(jump) + lit(0.85) * sum(col("contrib").cast("decimal(38,18)")).cast("double")).as("rank")
          else (lit(jump) + lit(0.85) * sum(col("contrib"))).as("rank")
        val next = contribs.groupBy(col("dst").as("node")).agg(summed)
        ranks = if (r % cutEvery == 0 || r == rounds) next.localCheckpoint() else next
      }
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"- $label: $rounds rounds in $wall%.2f s (${wall / rounds}%.3f s/round), n=$n")
      edgesDeg.unpersist(); outdeg.unpersist()
    }

    if (sys.env.get("PR_MODE").contains("plan")) {
      // dump the EXECUTED round-1 plan of the production (long-id) shape
      val el = longEdges()
      val edges = el.repartition(cpus, col("src")).persist()
      val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg")).persist()
      val edgesDeg = edges.join(outdeg, "src").persist()
      val n = outdeg.count(); edgesDeg.count()
      val jump = 0.15 / n
      val ranks = outdeg.select(col("src").as("node"), lit(1.0 / n).as("rank")).localCheckpoint()
      val next = edgesDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), (col("rank") / col("outdeg")).as("contrib"))
        .groupBy(col("dst").as("node"))
        .agg((lit(jump) + lit(0.85) *
          sum(col("contrib").cast("decimal(38,18)")).cast("double")).as("rank"))
      next.write.format("noop").mode("overwrite").save()
      println(next.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      spark.stop(); return
    }
    // r15: production-shape (long ids) round-loop variants — eager cut
    // (the shipping shape), lazy cut, no cut, and a co-partitioned RDD
    // loop with the exact same decimal arithmetic (one shuffle per
    // round, zero per-round planning/AQE/broadcast driver work).
    def prodEdges(): DataFrame = {
      val pairs = Tables.lineitem(spark, d)
        .select($"l_partkey".cast("long").as("p"), (-$"l_suppkey".cast("long") - 1L).as("q"))
        .distinct()
      pairs.select($"p".as("src"), $"q".as("dst"))
        .unionAll(pairs.select($"q".as("src"), $"p".as("dst")))
    }
    def dfLoop(label: String, eagerCut: Boolean, cut: Boolean = true, rounds: Int = 10,
               bcastRanks: Boolean = false): Unit = {
      val edges = prodEdges().repartition(cpus, col("src")).persist()
      val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg")).persist()
      val edgesDeg = edges.join(outdeg, "src").persist()
      val n = outdeg.count()
      edgesDeg.count()
      edges.unpersist()
      val jump = 0.15 / n
      val t0 = System.nanoTime()
      var ranks = outdeg.select(col("src").as("node"), lit(1.0 / n).as("rank")).localCheckpoint()
      for (r <- 1 to rounds) {
        val rside0 = ranks.withColumnRenamed("node", "src")
        val rside =
          if (bcastRanks) broadcast(rside0)
          else if (sys.env.get("PR_SHJ").contains("1")) rside0.hint("shuffle_hash")
          else rside0
        val next = edgesDeg
          .join(rside, "src")
          .select(col("dst"), (col("rank") / col("outdeg")).as("contrib"))
          .groupBy(col("dst").as("node"))
          .agg((lit(jump) + lit(0.85) *
            sum(col("contrib").cast("decimal(38,18)")).cast("double")).as("rank"))
        ranks = if (cut) next.localCheckpoint(eagerCut) else next
      }
      val cnt = ranks.count()
      val chk = ranks.agg(sum(col("rank"))).head().getDouble(0)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"- $label: $rounds rounds in $wall%.2f s (${wall / rounds}%.3f s/round), n=$cnt, sum=$chk%.12f")
      edgesDeg.unpersist(); outdeg.unpersist()
    }
    def rddLoop(label: String, rounds: Int = 10): Unit = {
      import org.apache.spark.HashPartitioner
      import java.math.{BigDecimal => JBD, RoundingMode}
      val part = new HashPartitioner(cpus)
      val e0 = prodEdges().as[(Long, Long)].rdd.partitionBy(part)
      val outdeg = e0.mapValues(_ => 1L).reduceByKey(part, _ + _)
      val edgesDeg = e0.join(outdeg).persist() // (src, (dst, outdeg)), hash(src)
      val n = outdeg.count()
      edgesDeg.count()
      val jump = 0.15 / n
      val t0 = System.nanoTime()
      var ranks = outdeg.mapValues(_ => 1.0 / n) // hash(node), same partitioner
      for (r <- 1 to rounds) {
        val contribs = edgesDeg.join(ranks) // narrow: both hash(src)
          .map { case (_, ((dst, deg), rank)) =>
            // Spark Cast(double -> decimal(38,18)): BigDecimal.valueOf
            // (shortest repr) then setScale(18, HALF_UP)
            (dst, JBD.valueOf(rank / deg).setScale(18, RoundingMode.HALF_UP))
          }
        ranks = contribs.reduceByKey(part, _.add(_))
          .mapValues(s => jump + 0.85 * s.doubleValue)
      }
      val cnt = ranks.count()
      val chk = ranks.values.sum()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"- $label: $rounds rounds in $wall%.2f s (${wall / rounds}%.3f s/round), n=$cnt, sum=$chk%.12f")
      edgesDeg.unpersist()
    }
    if (sys.env.get("PR_MODE").contains("v2")) {
      dfLoop("warmup", eagerCut = true, rounds = 3)
      dfLoop("C1 df eager-cut", eagerCut = true)
      dfLoop("C2 df eager-cut", eagerCut = true)
      dfLoop("D1 df lazy-cut", eagerCut = false)
      dfLoop("D2 df lazy-cut", eagerCut = false)
      rddLoop("E1 rdd co-part")
      rddLoop("E2 rdd co-part")
      spark.stop(); return
    }
    if (sys.env.get("PR_MODE").contains("v3")) {
      def withAqe(on: Boolean)(body: => Unit): Unit = {
        spark.conf.set("spark.sql.adaptive.enabled", on.toString)
        try body finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
      dfLoop("warmup", eagerCut = true, rounds = 3)
      withAqe(false) { dfLoop("F1 df eager-cut aqe-off", eagerCut = true) }
      withAqe(false) { dfLoop("F2 df eager-cut aqe-off", eagerCut = true) }
      withAqe(false) { dfLoop("G1 df lazy-cut aqe-off", eagerCut = false) }
      withAqe(false) { dfLoop("G2 df lazy-cut aqe-off", eagerCut = false) }
      dfLoop("H1 df lazy-cut aqe-on", eagerCut = false)
      withAqe(false) { dfLoop("I1 lazy aqe-off bcast", eagerCut = false, bcastRanks = true) }
      withAqe(false) { dfLoop("I2 lazy aqe-off bcast", eagerCut = false, bcastRanks = true) }
      dfLoop("J1 lazy aqe-on bcast", eagerCut = false, bcastRanks = true)
      dfLoop("J2 lazy aqe-on bcast", eagerCut = false, bcastRanks = true)
      spark.stop(); return
    }
    // warmup then measured, mirroring Bench's discarded pass
    loop("warmup (A)", strEdges(), decimalSum = true, rounds = 3)
    loop(s"A1 bypass=$bypass str+dec", strEdges(), decimalSum = true)
    loop(s"A2 bypass=$bypass str+dec", strEdges(), decimalSum = true)
    loop(s"A3 bypass=$bypass str+dec", strEdges(), decimalSum = true)
    loop(s"B1 bypass=$bypass str+dbl", strEdges(), decimalSum = false)
    loop(s"B2 bypass=$bypass str+dbl", strEdges(), decimalSum = false)
    spark.stop()
  }
}
