package graft.text

import graft.SparkSpec

/** BPE trainer/encoder semantics, pinned on hand-checkable corpora. */
class BpeSpec extends SparkSpec {

  test("applyMerges: left-to-right non-overlapping scan, rank order") {
    // even run: both pairs merge ("aaaa" -> [aa, aa]); odd run leaves a tail
    assert(Bpe.applyMerges("aaaa", Seq(("a", "a"))) == Seq("aa", "aa"))
    assert(Bpe.applyMerges("aaa", Seq(("a", "a"))) == Seq("aa", "a"))
    // rank order matters: (a,a) then (aa,b) consumes what round 1 built
    assert(Bpe.applyMerges("aab", Seq(("a", "a"), ("aa", "b"))) == Seq("aab"))
    // reversed ranks never see "aa" before (a,b) has split the tail
    assert(Bpe.applyMerges("aab", Seq(("a", "b"), ("a", "a"))) == Seq("a", "ab"))
    // merged symbols do not cascade within one scan: "abab" with (a,b)
    // gives [ab, ab], and (ab,ab) only fires in a later round
    assert(Bpe.applyMerges("abab", Seq(("a", "b"))) == Seq("ab", "ab"))
    assert(Bpe.applyMerges("abab", Seq(("a", "b"), ("ab", "ab"))) == Seq("abab"))
    assert(Bpe.applyMerges("", Nil).isEmpty)
  }

  test("pair counting on a planted vocabulary drives the known merges") {
    // "banana" x3 + "bandana": round 1's winner must be (a,n)
    // [weighted count 3*2 + 2 = 8]; after that merge both (an,a) and
    // (b,an) count 4 and the lexicographic tie-break elects (an,a)
    def pairCounts(words: Seq[(String, Long)], merges: Seq[(String, String)]) =
      words.flatMap { case (w, f) =>
        Bpe.applyMerges(w, merges).sliding(2).filter(_.size == 2)
          .map(p => (p.head, p(1)) -> f)
      }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val words = Seq(("banana", 3L), ("bandana", 1L))
    val c1 = pairCounts(words, Nil)
    assert(c1(("a", "n")) == 8L && c1.values.max == 8L)
    val c2 = pairCounts(words, Seq(("a", "n")))
    assert(c2(("an", "a")) == 4L && c2.values.max == 4L)
    val winner2 = c2.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
    assert(winner2._1 == (("an", "a")), s"tie-break elected ${winner2._1}")
  }

  test("encode round-trips: concatenated pieces rebuild each word") {
    val r = new scala.util.Random(7)
    val merges = Seq(("a", "n"), ("an", "a"), ("b", "ana"), ("t", "h"), ("th", "e"))
    (1 to 200).foreach { _ =>
      val w = (1 to (1 + r.nextInt(10))).map(_ => "abnthe" (r.nextInt(6))).mkString
      assert(Bpe.applyMerges(w, merges).mkString == w, s"round-trip broke on '$w'")
    }
  }

  test("driver-side rounds equal the distributed rounds exactly (r15 threshold path)") {
    // threshold 0 forces the distributed R-round loop; the default takes
    // the driver loop at this vocabulary size — the learned table (ranks,
    // symbols, weighted counts) must be identical, tie-breaks included
    val viaDriver      = Bpe.trainMerges(spark, sf0001)
    val viaDistributed = Bpe.trainMerges(spark, sf0001, driverThreshold = 0L)
    assert(viaDriver == viaDistributed)
  }

  test("driver queries: merge table shape and encode conservation") {
    val train = Bpe.textBpeTrain(spark, sf0001).collect()
    assert(train.length == Bpe.bpeMerges)
    assert(train.map(_.getInt(0)).toSeq == (1 to Bpe.bpeMerges))
    // merged = left || right on every row; weights positive and
    // non-increasing is NOT required (merges change the pair universe),
    // but every weight is at least 1
    train.foreach { row =>
      assert(row.getString(3) == row.getString(1) + row.getString(2))
      assert(row.getLong(4) >= 1L)
    }
    val enc = Bpe.textBpeEncode(spark, sf0001).collect()
    // merging only ever shrinks: pieces per doc <= chars, >= words
    enc.foreach { row =>
      assert(row.getLong(2) >= row.getLong(1),
        s"doc ${row.getLong(0)}: fewer pieces than words")
    }
  }
}
