package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-duplicate tests: LSH/SimHash must find known near-dups and
  * must not pair unrelated docs; minhash similarity must approximate true
  * Jaccard.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill near the garden gate every single morning"

  lazy val planted = Seq(
    (0L, base),
    (1L, base.replace("lazy", "sleepy")),              // near-dup of 0
    (2L, base),                                        // exact dup of 0
    (3L, "completely different content about spark catalyst optimizer rules and whole stage code generation for analytical queries at scale"),
    (4L, "another unrelated document mentioning parquet columnar storage predicate pushdown and partition pruning techniques in modern engines")
  ).toDF("doc_id", "text")

  test("minhash LSH finds planted near-dups and exact dups") {
    val pairs = Dedup
      .minhashPairs(planted, threshold = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pairs.contains((0L, 2L))) // exact dup
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists { case (a, b) => a >= 3L || b >= 3L }) // no false pairs
  }

  test("lsh recall audit: found ⊆ exact, recall in [0,1], corpus recall matches a hand count") {
    val r = Dedup.lshRecallAudit(spark, sf0001, threshold = 0.5).head()
    val (exact, found, recall) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(found <= exact, "LSH surfaced a pair outside the exact universe (verify stage broken)")
    assert(recall >= 0.0 && recall <= 1.0 && recall == found.toDouble / exact)
    // independent hand count of the exact universe on the corpus
    val docs = graft.tables.Tables.documents(spark, sf0001)
      .collect().map(x => (x.getLong(0), Hashing.shingleSet(x.getString(1)).toSet))
      .filter(_._2.nonEmpty)
    val handExact = (for {
      (a, sa) <- docs; (b, sb) <- docs if a < b
      j = (sa & sb).size.toDouble / (sa | sb).size if j >= 0.5
    } yield 1).size
    assert(exact == handExact, s"exact_pairs $exact != hand count $handExact")
  }

  test("containment join finds a doc subsumed by its superset in both directions") {
    // doc 10 ⊂ doc 11: 11 is 10 plus a long unrelated tail, so Jaccard is
    // low but containment(10→11) = 100; 12 is unrelated
    val tail =
      "entirely new trailing material about distributed shuffle services and columnar execution kernels appended to make the superset much longer than the original passage"
    val cdocs = Seq(
      (10L, base),
      (11L, base + " " + tail),
      (12L, "nothing in common with the others at all in any shingle window whatsoever today")
    ).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(cdocs).collect()
    val dirs = out.map(r => (r.getLong(0), r.getLong(1), r.getInt(5))).toList
    assert(dirs.exists { case (a, b, pct) => a == 10L && b == 11L && pct == 100 })
    // the reverse direction is below t = 4/5 and must NOT appear
    assert(!dirs.exists { case (a, b, _) => a == 11L && b == 10L })
    assert(!dirs.exists { case (a, b, _) => a == 12L || b == 12L })
    // n_a/n_b carried for the keep-the-superset decision
    val row = out.find(r => r.getLong(0) == 10L && r.getLong(1) == 11L).get
    assert(row.getInt(3) < row.getInt(4))
  }

  test("exact-dup pair has jaccard 1.0") {
    val m = Dedup
      .minhashPairs(planted, 0.5)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(m((0L, 2L)) == 1.0)
    assert(m((0L, 1L)) < 1.0 && m((0L, 1L)) > 0.5)
  }

  test("simhash: identical docs share signature, near-dups within hamming 3") {
    val sh = Dedup.simhash(planted).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // simhash variance is high on ~20-shingle docs; the invariant that
    // matters is the ordering, not an absolute bit count
    assert(ham(sh(0L), sh(1L)) <= 16)  // near-dup: fewer bits differ
    assert(ham(sh(0L), sh(3L)) > 16)   // unrelated: many bits differ
    assert(ham(sh(0L), sh(1L)) < ham(sh(0L), sh(3L)))
  }

  test("simhash pairs finds the exact dup via pigeonhole banding") {
    val pairs = Dedup
      .simhashPairs(planted, maxHamming = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pairs.contains((0L, 2L)))
    assert(!pairs.exists { case (a, b) => (a, b) == (3L, 4L) })
  }

  test("minhash band collision implies high estimated similarity (corpus)") {
    // on the driver corpus the planted near-dups surface as pairs with
    // verified jaccard >= 0.5; every reported pair must satisfy the
    // threshold (the verify stage is exact)
    val rows = Dedup.minhashPairs(
      graft.tables.Tables.documents(spark, sf0001), 0.5).collect()
    assert(rows.forall(_.getDouble(2) >= 0.5))
  }

  test("connected components: chain merges into one cluster, disjoint stays apart") {
    val pairs = Seq(
      (0L, 1L), (1L, 2L),       // chain 0-1-2
      (10L, 11L)                // separate pair
    ).toDF("doc_a", "doc_b")
    val cc = Dedup
      .connectedComponents(pairs)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(cc(0L) == 0L && cc(1L) == 0L && cc(2L) == 0L)
    assert(cc(10L) == 10L && cc(11L) == 10L)
  }

  test("distributed label propagation path matches union-find path") {
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("doc_a", "doc_b")
    val dist = Dedup.connectedComponents(pairs, driverThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val uf = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == uf)
  }

  test("dedup clusters on planted corpus: near-dups share a cluster") {
    val pairs = Dedup.minhashPairs(planted, 0.5)
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(0L) == 0L && cc(1L) == 0L && cc(2L) == 0L)
    assert(!cc.contains(3L) && !cc.contains(4L)) // non-dups have no pairs
  }

  test("keep list = corpus minus non-representative cluster members") {
    val keep = Dedup.dedupKeepList(spark, sf0001).collect().map(_.getLong(0)).toSet
    val clusters = Dedup
      .connectedComponents(
        Dedup.minhashPairs(graft.tables.Tables.documents(spark, sf0001), 0.5))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val dropped = clusters.filter { case (id, c) => id != c }.map(_._1).toSet
    assert(keep.intersect(dropped).isEmpty)
    assert(keep.size == 500 - dropped.size)
    // every cluster representative survives
    clusters.map(_._2).foreach(rep => assert(keep.contains(rep)))
  }

  test("shingles: word 3-grams, distinct, empty for short docs") {
    val df = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
    val m = df
      .select($"doc_id", Dedup.shingles($"text").as("sh"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
      .toMap
    assert(m(1L) == Seq("a b c", "b c d"))
    assert(m(2L).isEmpty)
  }

  test("exact dedup keeps min doc_id per content hash") {
    val out = Dedup.dedupExact(spark, sf0001).collect()
    assert(out.map(_.getLong(2)).sum == 500) // copies sum to corpus size
    assert(out.forall(_.getLong(2) >= 1))
  }

  test("winnow pairs: docs sharing a long substring are candidates; unrelated are not") {
    val shared = "the quick brown fox jumps over the lazy dog in the garden"
    val docs = Seq(
      (1L, s"prefix one $shared suffix alpha"),
      (2L, s"completely different beginning $shared another ending"),
      (3L, "unrelated text about catalyst optimizer and columnar storage engines")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // ≥15-char overlap guarantees shared fingerprints
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("adversarial all-identical corpus: bucket cap keeps LSH out of O(n²)") {
    // every doc identical → every band funnels into ONE bucket of size n.
    // Uncapped, the self-join would build n(n-1)/2 ≈ 3.1M candidate pairs;
    // with the cap the hot bucket is excluded and the stage stays O(n).
    // (These docs are exact dups — the md5 exact-dedup pass owns them.)
    val n = (Dedup.maxBucketSize + 1500).toInt
    val boiler = (0L until n.toLong).map(i => (i, base)).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(boiler, threshold = 0.5)
    assert(pairs.count() == 0) // capped bucket produces no pairs, no blowup
    // sanity: the same corpus plus one planted duplicate pair in a NORMAL
    // (size-2) bucket still dedups — the cap only silences degenerate
    // buckets. Identical docs ⇒ identical signatures ⇒ all 4 bands
    // collide deterministically (a J≈0.6 near-dup pair has only ~50%
    // band-collision probability and would make this test a coin flip).
    val mixed = boiler.union(Seq(
      (900001L, "totally distinct passage about columnar execution engines and vectorized readers"),
      (900002L, "totally distinct passage about columnar execution engines and vectorized readers")
    ).toDF("doc_id", "text"))
    val found = Dedup.minhashPairs(mixed, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.contains((900001L, 900002L)))
  }

  test("winnow clusters: labels are component minima; keep = docs minus non-reps") {
    val clusters = Dedup.dedupWinnowClusters(spark, sf0001).collect()
    assert(clusters.nonEmpty)
    // every cluster's label is the min doc_id among its members
    clusters.groupBy(_.getLong(1)).foreach { case (cid, rows) =>
      assert(rows.map(_.getLong(0)).min == cid, s"cluster $cid labeled above its min member")
    }
    val docs    = graft.tables.Tables.documents(spark, sf0001).count()
    val nonReps = clusters.count(r => r.getLong(0) != r.getLong(1))
    assert(Dedup.dedupWinnowKeep(spark, sf0001).count() == docs - nonReps)
  }

  test("KMV sketch: exact fallback below k, bounded error above k") {
    val rows = Dedup
      .kmvDistinct(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2), r.getLong(4), r.getLong(5)))
      .toMap
    // sf0.001 events: 15 users < k=256 -> the sketch IS the exact count
    val (k, gotU, estU, exactU) = rows("user_id")
    assert(gotU == exactU && estU == exactU)
    // 1000 event_ids > k -> real estimation; KMV stderr ~ 1/sqrt(k) ~ 6%,
    // assert a loose 4-sigma envelope so the test never flakes on data
    val (_, gotE, estE, exactE) = rows("event_id")
    assert(gotE == k.toLong)
    assert(math.abs(estE.toDouble / exactE.toDouble - 1.0) < 0.25, s"est $estE vs exact $exactE")
  }

  test("KMV estimator is deterministic across runs") {
    val a = Dedup.kmvDistinct(spark, sf0001).collect().toSeq
    val b = Dedup.kmvDistinct(spark, sf0001).collect().toSeq
    assert(a == b)
  }

  test("incremental CC equals the full recompute and actually skips untouched components") {
    import org.apache.spark.sql.functions.col
    val inc = Dedup.dedupCcIncremental(spark, sf0001).collect()
    val full = Dedup
      .connectedComponents(
        Dedup
          .winnowPairs(graft.tables.Tables.documents(spark, sf0001), minShared = Dedup.winnowMinShared)
          .select(col("doc_a"), col("doc_b")))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(inc.map(r => r.getLong(0) -> r.getLong(1)).toMap == full)
    val flags = inc.map(_.getInt(2)).toSeq
    assert(flags.contains(0), "no untouched nodes — the incremental path was vacuous")
    assert(flags.contains(1), "no recomputed nodes — the delta batch was empty")
    // cache hygiene across both CC invocations + the pair persist
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("kmv set-ops: exact regime at small SF, merge bounded by side sketches") {
    val r = Dedup.kmvSetops(spark, sf0001).collect().head
    def l(name: String) = r.getLong(r.fieldIndex(name))
    // below-k regime: every estimator degrades to the exact count
    assert(l("got_a") < 256 && l("got_b") < 256)
    assert(l("est_a") == l("exact_a"))
    assert(l("est_b") == l("exact_b"))
    assert(l("est_union") == l("exact_union"))
    assert(l("est_intersection") == l("exact_intersection"))
    // KMV merge structure: |A∪B| sketch is bounded by the side sketches
    // and at least as large as either side (below k nothing is dropped)
    assert(l("got_union") <= l("got_a") + l("got_b"))
    assert(l("got_union") >= math.max(l("got_a"), l("got_b")))
    // inclusion-exclusion sanity on the exact columns
    assert(l("exact_union") == l("exact_a") + l("exact_b") - l("exact_intersection"))
    // cache hygiene: both side persists released
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("ppjoin: planted near-dup kept with exact counts, near-miss pruned") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ppjoin").toString
    // A/B: shingle sets {pqr,qrs,rst,stu} vs {pqr,qrs,rst,stv} →
    // inter 3, union 5, J = 0.6 ≥ 1/2 → kept, jaccard_pct = 60.
    // A/D: share only {pqr} → J = 1/7 → pruned. C: disjoint.
    Seq(
      (1L, "p q r s t u"),
      (2L, "p q r s t v"),
      (3L, "alpha beta gamma delta epsilon"),
      (4L, "p q r x y z")
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Dedup.dedupPpjoinPairs(spark, dir).collect().map(_.toSeq)
    assert(rows.toSeq == Seq(Seq(1L, 2L, 3, 5, 60)))
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("ppjoin prefix bound: every >=t pair shares a (df,tok)-ordered prefix token") {
    // the lossless-pruning guarantee on real data: pairs from the exact
    // brute-force join (threshold 1/2) must all survive prefix filtering —
    // equality of the two result sets at sf0.001
    import spark.implicits._
    val docs = graft.tables.Tables
      .documents(spark, sf0001)
      .select($"doc_id", Dedup.shingles($"text").as("sh"))
      .filter(org.apache.spark.sql.functions.size($"sh") > 0)
    val brute = docs
      .as("a")
      .join(docs.as("b"), $"a.doc_id" < $"b.doc_id")
      .select(
        $"a.doc_id".as("doc_a"),
        $"b.doc_id".as("doc_b"),
        org.apache.spark.sql.functions
          .size(org.apache.spark.sql.functions.array_intersect($"a.sh", $"b.sh"))
          .as("i"),
        (org.apache.spark.sql.functions.size($"a.sh") +
          org.apache.spark.sql.functions.size($"b.sh")).as("ns")
      )
      .filter($"i" * Dedup.ppjoinTDen >= ($"ns" - $"i") * Dedup.ppjoinTNum)
      .select($"doc_a", $"doc_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val pruned = Dedup
      .dedupPpjoinPairs(spark, sf0001)
      .select($"doc_a", $"doc_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pruned == brute)
    assert(brute.nonEmpty) // the corpus actually exercises the path
  }
}
