package graft.queries

import graft.SparkSpec
import graft.syntax._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-level prefix-sum decomposition must equal the naive global
  * running sum it replaces, and the single-partition window it does keep
  * must see only day-grain rows (the calendar-bounded level), never the
  * transition stream.
  */
class SweeplineSpec extends SparkSpec {

  test("distributed sweep-line equals the naive global running sum") {
    val got = Advanced.tPeakConcurrency(spark, sf0001)

    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val sess = graft.tables.Tables
      .events(spark, sf0001)
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .withColumn(
        "new_session",
        ($"prev_ts".isNull ||
          unix_micros($"ts") - unix_micros($"prev_ts") > 1800L * 1000000L).cast("int")
      )
      .withColumn("session_id", sum($"new_session").over(byUser))
      .groupBy($"user_id", $"session_id")
      .agg(min($"ts").as("st"), (max($"ts") + expr("INTERVAL 30 MINUTES")).as("en"))
    val naive = sess
      .select($"st".as("t"), lit(1L).as("delta"))
      .unionAll(sess.select($"en".as("t"), lit(-1L).as("delta")))
      .groupBy($"t")
      .agg(sum($"delta").as("sd"))
      .withColumn(
        "active",
        sum($"sd").over(Window.orderBy($"t").rowsBetween(Window.unboundedPreceding, 0))
      )
      .groupBy(date_trunc("day", $"t").cast("date").as("dt"))
      .agg(max($"active").as("peak_active"))
      .orderBy($"dt")

    val g = got.collect().toSeq
    assert(g.nonEmpty && g.forall(_.getLong(1) > 0), "degenerate peaks")
    assert(g == naive.collect().toSeq, "decomposed prefix sum diverged from the global window")
  }

  test("the only partition-less window in the plan is the day-grain level") {
    val df = Advanced.tPeakConcurrency(spark, sf0001)
    df.collect() // materialize so AQE finalizes every stage
    val partitionless = graft.plans.WindowAudit.partitionless(df.queryExecution.executedPlan)
    // exactly one unpartitioned window — the day-offset running sum whose
    // input is the per-day aggregate (calendar-bounded), recognizable by
    // its day-grain ordering column
    assert(partitionless.length == 1, s"expected 1 partition-less window, got ${partitionless.length}")
    val ordCols = partitionless.head.orderSpec.map(_.child.toString).mkString(",")
    assert(ordCols.contains("dt"), s"unexpected partition-less window ordered by $ordCols")
  }
}
