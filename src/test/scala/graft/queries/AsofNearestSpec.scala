package graft.queries

import graft.SparkSpec
import graft.syntax._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** j_asof_nearest must equal the brute-force nearest-purchase selection
  * (all pairs, min distance, causal tie-break) — the O(n·m) definition
  * the two-pass as-of composition avoids.
  */
class AsofNearestSpec extends SparkSpec {

  test("two-pass as-of nearest equals the brute-force pair minimum") {
    val got = AsofJoin.jAsofNearest(spark, sf0001)
      .select($"event_id", $"purchase_id", $"direction", $"delta_us")

    val e = graft.tables.Tables.events(spark, sf0001)
    val p = e.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("pts"), $"event_id".as("pid"))
    val l = e.filter($"event_type" =!= "purchase")
      .select($"event_id", $"user_id", $"ts")
    // brute force: every (left, purchase) pair of the same user, ranked
    // by (|delta|, causal-side-first, pid desc — matching the engine's
    // max-id tie among same-ts purchases)
    val pairs = l.join(p, Seq("user_id"))
      .withColumn("delta", abs(unix_micros($"ts") - unix_micros($"pts")))
      .withColumn("is_after", ($"pts" > $"ts").cast("int"))
    val w = Window.partitionBy($"event_id").orderBy($"delta", $"is_after", $"pid".desc)
    val brute = pairs
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select(
        $"event_id",
        $"pid".as("purchase_id"),
        when($"is_after" === 1, "after").otherwise("before").as("direction"),
        $"delta".as("delta_us")
      )

    val g = got.filter($"purchase_id".isNotNull).orderBy($"event_id").collect().toSeq
    val b = brute.orderBy($"event_id").collect().toSeq
    assert(g.nonEmpty && g == b, s"nearest selection diverged (got ${g.length} vs brute ${b.length})")

    // matchless lefts: users with no purchases at all
    val matchless = got.filter($"purchase_id".isNull).count()
    val usersNoPurchase = l.join(p.select($"user_id").distinct(), Seq("user_id"), "left_anti").count()
    assert(matchless == usersNoPurchase, s"$matchless null matches vs $usersNoPurchase purchase-free events")
  }
}
