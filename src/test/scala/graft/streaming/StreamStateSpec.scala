package graft.streaming

import graft.SparkSpec
import graft.syntax._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The flatMapGroupsWithState milestone machine must equal the batch
  * window-function replay of the same fold (the stream/batch convergence
  * contract the other §2.10 queries pin), and milestones must be strictly
  * increasing per user.
  */
class StreamStateSpec extends SparkSpec {

  test("milestone alerts equal the batch cumulative replay") {
    val out = StreamQueries.streamState(spark, sf0001)
    val n   = out.count()
    assert(n > 0, "no milestone crossings at sf0.001 — the test would be vacuous")

    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val batch = graft.tables.Tables
      .events(spark, sf0001)
      .filter($"event_type" === "purchase")
      .select(
        $"user_id", $"event_id", $"ts",
        ($"value".cast("decimal(18,2)") * lit(100)).cast("long").as("vc")
      )
      .withColumn("cum", sum($"vc").over(byUser))
      .withColumn("lvl", expr(s"cum div ${StreamQueries.milestoneCents}"))
      .withColumn("prev_lvl", lag($"lvl", 1, 0).over(byUser))
      .filter($"lvl" > $"prev_lvl")
      .select(
        $"user_id", $"event_id", $"ts",
        $"lvl".as("milestone"),
        ($"cum".cast("double") / 100.0).as("cum_value")
      )
      .orderBy($"user_id", $"ts", $"event_id")

    assert(out.collect().toSeq == batch.collect().toSeq,
      "streaming state machine diverged from the batch cumulative replay")
  }

  test("milestones strictly increase per user") {
    val rows = StreamQueries.streamState(spark, sf0001)
      .select($"user_id", $"milestone")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    rows.groupBy(_._1).foreach { case (u, ms) =>
      val seq = ms.map(_._2).toSeq
      assert(seq == seq.sorted && seq.distinct.length == seq.length,
        s"user $u milestones not strictly increasing: $seq")
    }
  }
}
