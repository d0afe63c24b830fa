package graft.text

import graft.SparkSpec

/** TextRank invariants: with symmetrized edges every node has out-weight,
  * so no dangling mass leaks — total rank stays 1 through every round —
  * and the iteration is deterministic run-to-run.
  */
class TextRankSpec extends SparkSpec {

  test("rank mass is conserved and the iteration is deterministic") {
    val a = TextAnalysis.textTextrank(spark, sf0001).collect()
    assert(a.nonEmpty)
    val mass = a.map(_.getDouble(1)).sum
    assert(math.abs(mass - 1.0) < 1e-6, s"rank mass $mass drifted from 1")
    val b = TextAnalysis.textTextrank(spark, sf0001).collect()
    assert(a.toSeq == b.toSeq, "re-run diverged — iteration not deterministic")
  }
}
