package graft.sim

import graft.SparkSpec

/** IVF vs brute-force recall, and basic top-k invariants. */
class SimilaritySpec extends SparkSpec {

  lazy val bf  = Similarity.bruteForceTopK(spark, sf0001, k = 5).collect()
  lazy val ivf = Similarity.ivfTopK(spark, sf0001, k = 5, nCells = 16, nprobe = 4).collect()

  test("brute force: 10 probes x 5 neighbors, ranks 1..5, sims sorted") {
    assert(bf.length == 50)
    val byProbe = bf.groupBy(_.getLong(0))
    assert(byProbe.size == 10)
    byProbe.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to 5))
      val sims = sorted.map(_.getDouble(2)).toSeq
      assert(sims == sims.sorted.reverse)
    }
  }

  test("no probe returns itself") {
    assert(bf.forall(r => r.getLong(0) != r.getLong(1)))
  }

  test("IVF recall@5 against brute force is nontrivial (> 0.4)") {
    val bfSet  = bf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfSet = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bfSet & ivfSet).size.toDouble / bfSet.size
    // random 64-d embeddings are a worst case for coarse quantization;
    // the invariant worth locking is "the probe path returns genuine
    // high-cosine neighbors", measured as recall well above chance
    // (chance ≈ k/n = 5/500 = 1%).
    assert(recall > 0.4, s"recall=$recall")
  }

  test("IVF similarities are a subset-maximum: never exceed brute-force top1") {
    val bfTop = bf.filter(_.getInt(3) == 1).map(r => r.getLong(0) -> r.getDouble(2)).toMap
    ivf.foreach { r => assert(r.getDouble(2) <= bfTop(r.getLong(0)) + 1e-9) }
  }
}
