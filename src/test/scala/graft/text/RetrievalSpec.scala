package graft.text

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {

  test("bm25: a verbatim duplicate of the query doc is its top hit") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    // doc 10 repeats probe 0's text verbatim; doc 11 shares one term;
    // doc 12 shares nothing. All probe terms are rare (df=2), so the
    // duplicate's full-term tf dominates any partial match.
    Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "epsilon zeta eta theta"),
      (2L, "iota kappa lambda mu"),
      (3L, "nu xi omicron pi"),
      (4L, "rho sigma tau upsilon"),
      (10L, "alpha beta gamma delta"),
      (11L, "alpha filler1 filler2 filler3"),
      (12L, "phi chi psi omega")
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Retrieval.bm25TopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val p0 = rows.filter(_._1 == 0L).sortBy(_._4)
    assert(p0.head._2 == 10L, s"probe 0 top hit ${p0.head._2}, want the verbatim duplicate 10")
    assert(p0.head._3 > p0(1)._3, "duplicate must out-score the partial match")
    assert(p0.map(_._2).contains(11L), "single-shared-term doc must still be retrieved")
    assert(!p0.map(_._2).contains(12L), "zero-overlap doc must not appear")
  }

  test("rrf fusion: scores descend with rank, stay under the 2-ranker bound, cover every probe") {
    val rows = Retrieval.rrfFusion(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    val bound = 2.0 / (Retrieval.rrfC + 1)
    rows.foreach { case (_, _, s, _) => assert(s > 0 && s <= bound + 1e-9, s"rrf $s out of (0, $bound]") }
    rows.groupBy(_._1).foreach { case (p, g) =>
      val byRank = g.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1 to g.length), s"probe $p: ranks not contiguous")
      assert(byRank.map(_._3).toSeq == byRank.map(_._3).sorted(Ordering[Double].reverse).toSeq,
        s"probe $p: rrf not descending")
    }
    assert(rows.map(_._1).distinct.length == Retrieval.bmProbes)
  }
}
