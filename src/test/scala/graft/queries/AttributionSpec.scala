package graft.queries

import graft.SparkSpec
import graft.syntax._
import org.apache.spark.sql.functions._

/** Credit-conservation invariants: each attributed purchase hands out its
  * full value exactly once under first- and last-touch, and linear credit
  * re-assembles to the same total within the 6-dp rounding budget.
  */
class AttributionSpec extends SparkSpec {

  test("all three models conserve the attributed purchase value") {
    val rows = Advanced.eAttribution(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val first  = rows.map(_.getDouble(1)).sum
    val last   = rows.map(_.getDouble(2)).sum
    val linear = rows.map(_.getDouble(3)).sum
    val nFirst = rows.map(_.getLong(4)).sum
    val nLast  = rows.map(_.getLong(5)).sum
    assert(nFirst == nLast, s"conversion counts diverge: $nFirst vs $nLast")
    assert(first == last, s"first/last totals diverge: $first vs $last")
    // linear shares are rounded per touch at 6 dp — the reassembled total
    // may drift by at most n_touches * 5e-7
    assert(math.abs(linear - first) < 0.01, s"linear total $linear vs $first")
    assert(first > 0, "no attributed value — vacuous corpus")
  }
}
