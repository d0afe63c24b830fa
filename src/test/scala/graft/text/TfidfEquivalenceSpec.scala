package graft.text

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class TfidfEquivalenceSpec extends SparkSpec {

  private def tf(d: String) =
    Tables
      .documents(spark, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))

  test("dense all-pairs path is bit-identical to the postings join (sf0.001 and sf0.01)") {
    for (d <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val docs  = Tables.documents(spark, d)
      val t     = tf(d).persist()
      try {
        val post  = TextAnalysis.tfidfPostingsPairs(docs, t).collect().toSeq
        val dense = TextAnalysis.tfidfDensePairs(spark, t, docs.count()).collect().toSeq
        assert(dense == post, s"path divergence at $d")
        assert(post.nonEmpty, s"vacuous equivalence at $d")
      } finally t.unpersist()
    }
  }

  test("routing: postings under the df² budget, dense over it, fail-fast past the caps") {
    assert(TextAnalysis.tfidfRoute(BigInt(4541675L), 31, 500) == TextAnalysis.TfidfPostings)
    assert(TextAnalysis.tfidfRoute(BigInt(448474923L), 31, 5000) == TextAnalysis.TfidfDense)
    // bounded-vocab regimes the dense path must refuse: huge vocab or n²
    intercept[IllegalArgumentException] {
      TextAnalysis.tfidfRoute(BigInt("99999999999"), 1000000, 5000)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.tfidfRoute(BigInt("99999999999"), 31, 5000000)
    }
  }

  test("the gate corpus' near-dup pairs are invisible to shingle LSH (why no MinHash prefilter)") {
    // the measured fact that rules out the obvious candidate generator:
    // nearly all ≥0.85-cosine pairs here share tf PATTERNS, not 3-gram
    // phrases — their shingle Jaccard is ≤ ~0.02, far below any LSH
    // banding threshold, so a shingle-MinHash prefilter would recall only
    // the handful of literal near-dups and silently drop the rest
    val docs  = Tables.documents(spark, sf0001)
    val t     = tf(sf0001).persist()
    try {
      val pairs = TextAnalysis.tfidfPostingsPairs(docs, t).collect()
      assert(pairs.length > 100)
      val sh = docs
        .select(col("doc_id"), graft.dedup.Dedup.shingles(col("text")).as("sh"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
        .toMap
      val jac = pairs.map { p =>
        val (a, b) = (sh(p.getLong(0)), sh(p.getLong(1)))
        a.intersect(b).size.toDouble / a.union(b).size
      }
      val lshInvisible = jac.count(_ < 0.1)
      assert(lshInvisible.toDouble / jac.length > 0.9,
        s"only $lshInvisible/${jac.length} pairs below LSH visibility — a prefilter might work here")
    } finally t.unpersist()
  }
}
