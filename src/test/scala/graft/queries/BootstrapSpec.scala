package graft.queries

import graft.SparkSpec
import graft.syntax._
import org.apache.spark.sql.functions._

/** The bootstrap CI must be a genuine interval around the sample mean —
  * deterministic on fixed data, so this is a hard assertion, not a
  * probabilistic one.
  */
class BootstrapSpec extends SparkSpec {

  test("CI is ordered and brackets the sample mean at sf0.001") {
    val r = Advanced.aBootstrapCi(spark, sf0001).collect()(0)
    val (m, lo, hi) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    val trueMean = graft.tables.Tables
      .lineitem(spark, sf0001)
      .agg(avg($"l_quantity"))
      .collect()(0)
      .getDouble(0)
    assert(lo < hi, s"degenerate interval [$lo, $hi]")
    assert(lo <= trueMean && trueMean <= hi, s"CI [$lo, $hi] misses true mean $trueMean")
    assert(lo <= m && m <= hi, s"boot mean $m outside its own CI")
  }
}
