package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Skew-join A/B (extracted from the retired StressR11 when the corpus
  * probes unified into [[Stress]]): a 50%-of-rows hot key through a
  * forced sort-merge join, three ways — unsalted with AQE's skew
  * splitter off, unsalted with it on (Spark's built-in remedy), and the
  * explicit [[graft.queries.SkewJoin.saltedInnerJoin]] spread. The r11
  * measurement (BENCH_LOCAL §r11): AQE's splitter matches the manual
  * 8-way salt on wall while the salt pays +30% shuffle — recorded
  * recommendation: AQE at fleet scale, salt where AQE is off or the
  * skew sits inside an aggregation. Uses the `fact` corpus from
  * [[Stress]] (run that first, or this builds it).
  */
object SkewAb {

  def main(args: Array[String]): Unit = {
    val base  = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult  = sys.env.getOrElse("SPARK_GRAFT_STRESS_MULT", "10").toInt
    val spark = GraftSession.local(32, "graft-skew-ab")
    import spark.implicits._
    val meter = new StressUtil.Meter(spark)

    // same corpus dir + recipe as Stress --corpus fact. A plain
    // existence/key check, NOT cachedDir: cachedDir deletes an invalid
    // dir before running its build block, so routing a "must already
    // exist" guard through it would destroy the corpus it guards (r12
    // review).
    val dirN  = s"/tmp/graft_stress_r11_x$mult"
    val ready = java.nio.file.Paths.get(s"$dirN/_READY")
    require(
      java.nio.file.Files.exists(ready) && java.nio.file.Files.readString(ready).trim == base,
      s"fact corpus for $base missing/stale at $dirN — build it first: " +
        s"runMain graft.tools.Stress --corpus fact --mult $mult")

    val hot = graft.tables.Tables
      .lineitem(spark, dirN)
      .withColumn(
        "p_partkey",
        when($"l_orderkey" % 2 === 0, lit(1L)).otherwise($"l_partkey"))
      .select($"p_partkey", $"l_quantity", $"l_extendedprice")
    val p = graft.tables.Tables.part(spark, dirN)
    def aggJoin(joined: org.apache.spark.sql.DataFrame) = joined
      .groupBy($"p_brand")
      .agg(sum($"l_quantity").as("q"), count(lit(1)).as("n"))
    def withConf[A](pairs: (String, String)*)(f: => A): A = {
      val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f
      finally saved.foreach { case (k, o) => o.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    }
    val results = withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val (rNoAqe, _, _, _) = withConf("spark.sql.adaptive.skewJoin.enabled" -> "false") {
        meter.measured(s"skew SMJ unsalted, AQE skew OFF @${mult}x, 50% hot key") {
          aggJoin(hot.join(p, Seq("p_partkey"))).collect()
        }
      }
      val (rAqe, _, _, _) = meter.measured(s"skew SMJ unsalted, AQE skew ON @${mult}x, 50% hot key") {
        aggJoin(hot.join(p, Seq("p_partkey"))).collect()
      }
      val (rSalt, _, _, _) = meter.measured(s"skew SMJ SALTED (8 salts) @${mult}x, 50% hot key") {
        aggJoin(graft.queries.SkewJoin.saltedInnerJoin(hot, p, "p_partkey", salts = 8)).collect()
      }
      Seq(rNoAqe, rAqe, rSalt)
    }
    val canon = results.map(_.sortBy(_.getString(0)).toSeq)
    require(canon.forall(_ == canon.head), "skew-join variants disagree")
    println("- all three skew-join variants byte-identical")
    spark.stop()
  }
}
