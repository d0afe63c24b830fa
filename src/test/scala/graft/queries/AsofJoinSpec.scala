package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof matches per-row brute force on the events corpus") {
    val out = AsofJoin.jAsof(spark, sf0001)
    // brute force: range join + arg-max — quadratic reference
    val e = graft.tables.Tables.events(spark, sf0001)
    val p = e.filter($"event_type" === "purchase")
      .select($"user_id".as("pu"), $"ts".as("pts"), $"event_id".as("pid"), $"value".as("pv"))
    val l = e.filter($"event_type" =!= "purchase")
    val brute = l
      .join(p, $"user_id" === $"pu" && $"pts" <= $"ts", "left")
      .groupBy($"event_id")
      .agg(max(struct($"pts", $"pid", $"pv")).as("m"))
      .select($"event_id", $"m.pid".as("purchase_id"))
    val got = out.select($"event_id", $"purchase_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val exp = brute.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == exp)
    assert(got.valuesIterator.exists(_ >= 0L) && got.valuesIterator.exists(_ == -1L))
  }

  test("a right row at exactly t is visible; ties on right time resolve to max tiebreak") {
    val left = Seq((1L, 10L, "a"), (1L, 5L, "b"), (2L, 10L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100L, 1.0), (1L, 10L, 101L, 2.0), (1L, 7L, 50L, 3.0))
      .toDF("k", "t", "rid", "rv")
    val out = AsofJoin.asof(left, right, "k", "t", "t", Seq("rid", "rv"))
      .collect().map(r => (r.getString(2), Option(r.get(3)), Option(r.get(4)))).toSet
    assert(out == Set(
      ("a", Some(101L), Some(2.0)), // equal-time right visible, max rid wins the tie
      ("b", None, None),            // nothing at-or-before 5
      ("c", None, None)             // key with no right rows
    ))
  }

  test("plan: one shuffle (window exchange), no range join") {
    val out = AsofJoin.jAsof(spark, sf0001)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected 1 hash exchange, got $shuffles:\n$plan")
  }

  test("forward direction: earliest at-or-after wins; exact-t visible; null-time left matchless") {
    val left = Seq((1L, Some(10L), "a"), (1L, Some(20L), "b"), (1L, None, "n"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100L, 1.0), (1L, 15L, 200L, 2.0), (1L, 12L, 150L, 3.0))
      .toDF("k", "t", "rid", "rv")
    val out = AsofJoin
      .asof(left, right, "k", "t", "t", Seq("rid", "rv"), forward = true)
      .collect().map(r => (r.getString(2), Option(r.get(3)))).toSet
    assert(out == Set(
      ("a", Some(100L)), // exact-t right row included ("at-or-after")
      ("b", None),       // nothing at-or-after 20
      ("n", None)        // null left time never matches
    ))
    // earliest (not just any later) right row wins: t=11 → rid 150 at t=12
    val out2 = AsofJoin
      .asof(Seq((1L, 11L, "x")).toDF("k", "t", "tag"), right, "k", "t", "t",
        Seq("rid", "rv"), forward = true)
      .collect().map(r => Option(r.get(3))).toSeq
    assert(out2 == Seq(Some(150L)))
  }
}
