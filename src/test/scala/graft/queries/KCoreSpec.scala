package graft.queries

import graft.SparkSpec

/** The k-core contract: after the fixed peel rounds every surviving node
  * must hold degree ≥ k within the core — that inequality IS the fixpoint
  * proof (an unconverged peel would emit a node the next round would
  * drop).
  */
class KCoreSpec extends SparkSpec {

  test("emitted core is a genuine fixpoint at sf0.01") {
    val rows = Graph.gKCore(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty, "empty core — peel collapsed, k miscalibrated")
    val minDeg = rows.map(_.getLong(1)).min
    assert(minDeg >= Graph.kCoreK,
      s"min core degree $minDeg < k=${Graph.kCoreK}: 8 rounds did not converge")
  }
}
