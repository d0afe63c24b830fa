package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {

  test("ngram lang-id classifies real language samples") {
    assert(NgramLangId.classify("the cat sat on the mat and looked at the dog in the garden") == "en")
    assert(NgramLangId.classify("el perro y el gato de la casa en los jardines para una fiesta") == "es")
    assert(NgramLangId.classify("der hund und die katze sind in dem haus mit den kindern nicht") == "de")
    assert(NgramLangId.classify("le chien et le chat dans les jardins de la maison pour une") == "fr")
    assert(NgramLangId.classify("") == "und")
    assert(NgramLangId.classify("zzz qqq xxx") == "und")
  }

  test("token counts and quality ratios are internally consistent") {
    val rows = TextAnalysis.textQuality(spark, sf0001).collect()
    rows.foreach { r =>
      val stopRatio = r.getDouble(2)
      val ttr = r.getDouble(4)
      assert(stopRatio >= 0.0 && stopRatio <= 1.0)
      assert(ttr > 0.0 && ttr <= 1.0)
      assert(r.getInt(5) >= 0 && r.getInt(5) <= 3)
    }
  }

  test("winnowing: shared substrings share fingerprints, disjoint texts don't") {
    import graft.dedup.Hashing
    val a = "the quick brown fox jumps over the lazy dog near the old garden gate this morning"
    val b = "yesterday " + a + " again"       // contains a as substring
    val c = "zq xv wk pj completely unrelated gibberish tokens mnop qrst uvwx yzab cdef ghij"
    val fa = Hashing.winnow(a).toSet
    val fb = Hashing.winnow(b).toSet
    val fc = Hashing.winnow(c).toSet
    assert((fa & fb).size.toDouble / fa.size > 0.7) // containment detected
    assert((fa & fc).isEmpty)                       // no spurious overlap
    // guarantee: identical text → identical fingerprint set
    assert(Hashing.winnow(a).toSeq == Hashing.winnow(a).toSeq)
  }

  test("rolling hash is consistent with direct hashing per window") {
    import graft.dedup.Hashing
    val s = "abcdefghijklmnop"
    val k = 5
    val rolled = Hashing.rollingHashes(s, k)
    val direct = (0 to s.length - k).map { i =>
      s.substring(i, i + k).foldLeft(0L)((h, c) => h * 1000000007L + c)
    }
    assert(rolled.toSeq == direct)
  }

  test("fingerprint md5 matches exact-dedup content hash semantics") {
    val fp = TextAnalysis.textFingerprint(spark, sf0001).collect()
    assert(fp.map(_.getString(1)).distinct.length <= fp.length)
    assert(fp.forall(_.getString(1).length == 32))
  }

  test("repetition filters: planted top-bigram and duplicated-5-gram cases") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-repetition").toString
    Seq(
      // "x y" appears 3 times over 6 chars of words → top2 = 3*2/6 = 1.0;
      // every 5-gram is unique → dup5 = 0
      (1L, "x y x y x y"),
      // 10×"a": "a a a a a" occurs 6 times → all 10 positions covered →
      // dup5 = 1.0; top2 = 9 overlapping occurrences × 2 chars / 10 = 1.8
      // (the count×len product deliberately exceeds 1 on pure repetition)
      (2L, "a a a a a a a a a a"),
      // no repeated n-gram of any size: dup fractions all 0, keep=0 is
      // still forced by top2 = 1/15 vs m=4 short-window products
      (3L, "alpha beta gamma delta")
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis
      .textRepetition(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap
    assert(rows(1L).getDouble(1) == 1.0)  // top2_frac
    assert(rows(1L).getDouble(4) == 0.0)  // dup5_frac
    assert(rows(2L).getDouble(1) == 1.8)
    assert(rows(2L).getDouble(4) == 1.0)
    assert(rows(2L).getInt(10) == 0)      // keep rejects pure repetition
    (4 to 9).foreach(i => assert(rows(3L).getDouble(i) == 0.0)) // all dup fracs
    // coverage is a true fraction even where the count×len product is not
    rows.values.foreach(r => (4 to 9).foreach { i =>
      assert(r.getDouble(i) >= 0.0 && r.getDouble(i) <= 1.0)
    })
  }

  test("cross-doc dup spans: shared 8-gram flags both docs, unique doc untouched") {
    import spark.implicits._
    val dir    = java.nio.file.Files.createTempDirectory("graft-dupspans").toString
    val shared = "one two three four five six seven eight"
    Seq(
      (1L, s"alpha $shared omega"),
      (2L, s"beta gamma $shared"),
      (3L, "totally different words with no overlap at all here")
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis
      .textDupSpans(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getInt(3))))
      .toMap
    // both carriers see exactly the one shared 8-gram start
    assert(rows(1L)._1 == 1 && rows(2L)._1 == 1)
    assert(rows(1L)._2 > 0.0 && rows(2L)._2 > 0.0)
    assert(rows(3L) == ((0, 0.0, 1)))
    // doc 2's covered chars: the 8 shared words out of 10 words
    val covered = shared.replace(" ", "").length.toDouble
    val total   = s"beta gamma $shared".replace(" ", "").length.toDouble
    assert(rows(2L)._2 == covered / total)
  }

  test("mixture sampling: sqrt temperature upsamples tail languages, deterministic") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mixture").toString
    val docs = (1L to 90L).map(i => (i, s"head doc $i", "en")) ++
      (91L to 100L).map(i => (i, s"tail doc $i", "fr"))
    docs.toDF("doc_id", "text", "lang").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.textMixtureSample(spark, dir).collect()
    val rateByLang = rows.map(r => r.getString(1) -> r.getDouble(2)).toMap
    // en: share = sqrt(90)/(sqrt(90)+sqrt(10)) ≈ .75, target ≈ 37.5 of 90 → rate < 1
    // fr: target ≈ 12.5 of 10 → clamped to 1.0 (every tail doc kept)
    assert(rateByLang("fr") == 1.0)
    assert(rateByLang("en") < 0.5)
    assert(rows.count(_.getString(1) == "fr") == 10)
    // deterministic: same corpus, same sample
    val again = TextAnalysis.textMixtureSample(spark, dir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("tf-idf pairs: exact dup scores 1.0, partial overlap stays below the near-dup band") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tfidf").toString
    // N=4 ⇒ df window keeps 2 ≤ df ≤ 3: alpha/beta (df 3), gamma (df 2);
    // delta and doc 4's tokens are all df=1 ⇒ pruned (doc 4 drops out
    // entirely — no norm row, no pair, no div-by-zero)
    Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"), // exact duplicate of 1
      (3L, "alpha beta delta"), // cos vs 1/2 = 0.506 — below 0.85
      (4L, "zz yy xx")
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.textTfidfPairs(spark, dir).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq == Seq((1L, 2L, 1.0)))
  }

  test("text_oov_rate: held-out splits only, rates bounded, oov <= total") {
    val rows = TextAnalysis.textOovRate(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("test", "val"))
    rows.foreach { r =>
      val (n, oov, rate)      = (r.getLong(1), r.getLong(2), r.getDouble(3))
      val (ty, oovTy, tyRate) = (r.getLong(4), r.getLong(5), r.getDouble(6))
      assert(oov <= n && oovTy <= ty)
      assert(rate >= 0.0 && rate <= 1.0 && tyRate >= 0.0 && tyRate <= 1.0)
      // token-level novelty can't exceed type-level on a closed unigram
      // vocabulary corpus where unseen grams are mostly singletons
      assert(ty <= n)
    }
  }

  test("text_split_divergence: KL and JSD non-negative, JSD <= ln 2") {
    val rows = TextAnalysis.textSplitDivergence(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("test", "val"))
    rows.foreach { r =>
      val (kl, jsd) = (r.getDouble(1), r.getDouble(2))
      assert(kl >= -1e-9, s"negative KL: $kl")
      assert(jsd >= -1e-9 && jsd <= math.log(2.0) + 1e-9, s"JSD out of range: $jsd")
    }
  }

  test("text_weighted_sample: exact ES top-k, sample skews toward long docs") {
    val docs = graft.tables.Tables
      .documents(spark, sf0001)
      .select("doc_id", "n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // driver-side recompute of the Efraimidis–Spirakis selection
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expect = docs
      .map { case (id, w) =>
        val u = (java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) + 0.5) / 4294967296.0
        (id, BigDecimal(math.log(u) / w).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, k) => (-k, id) }
      .take(50)
      .map(_._1)
      .toSeq
    val got = TextAnalysis.textWeightedSample(spark, sf0001).collect()
    assert(got.map(_.getLong(0)).toSeq == expect)
    assert(got.map(_.getInt(3)).toSeq == (1 to 50))
    // weighting ∝ n_chars must pull the sample's mean length above the
    // corpus mean (chance of the opposite under correct weighting ≈ 0)
    val corpusMean = docs.map(_._2).sum.toDouble / docs.length
    val sampleMean = got.map(_.getLong(1)).sum.toDouble / got.length
    assert(sampleMean > corpusMean, s"sample mean $sampleMean !> corpus mean $corpusMean")
  }

  test("text_domain_cap: native top-k plan, equals the window formulation") {
    val df = TextAnalysis.textDomainCap(spark, sf0001)
    val got = df.collect()
    // planned through the custom operator, not a full-corpus window sort
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    // quota honored per source, ranks dense from 1
    got.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(rows.length <= 10)
      assert(rows.map(_.getInt(3)).sorted.toSeq == (1 to rows.length))
    }
    // row-identical to the window row_number formulation
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_chars").desc, col("doc_id"))
    val expect = graft.tables.Tables.documents(spark, sf0001)
      .withColumn("cap_rank", row_number().over(w).cast("int"))
      .filter(col("cap_rank") <= 10)
      .select(col("source"), col("doc_id"), col("n_chars"), col("cap_rank"))
      .orderBy(col("source"), col("cap_rank"))
      .collect()
    assert(got.map(_.toSeq).toSeq == expect.map(_.toSeq).toSeq)
  }

  test("text_pmi_pairs: hand-computed lifts, count floor, deterministic tie order") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pmi").toString
    // bigram counts: (a,b)=5, (c,d)=5, (d,c)=3, (b,a)=2, (b,c)=1, (d,a)=1
    // → N=17; only the two count-5 pairs clear pmiMinCount=5.
    // lift(a,b) = 5·17·10⁶ // (cf(a)=5 · cs(b)=5) = 3_400_000 = lift(c,d);
    // the tie resolves by w1 asc.
    Seq(
      (1L, "a b a b a b"),
      (2L, "a b c d a b"),
      (3L, "c d c d c d c d")
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.textPmiPairs(spark, dir).collect().map(_.toSeq)
    assert(rows.toSeq == Seq(
      Seq("a", "b", 5L, 5L, 5L, 3400000L),
      Seq("c", "d", 5L, 5L, 5L, 3400000L)
    ))
  }

  test("nb classifier: separable planted corpus classifies every held-out doc correctly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-nb").toString
    // even ids train, odd ids score; the two sources share no vocabulary,
    // so NB must put every held-out doc on its own source's diagonal
    Seq(
      (0L, "red apple pie apple sweet", "fruit"),
      (2L, "apple tart red apple", "fruit"),
      (4L, "green apple pie apple", "fruit"),
      (1L, "apple red sweet", "fruit"),
      (5L, "pie apple green", "fruit"),
      (6L, "fast car engine wheel", "auto"),
      (8L, "car wheel engine brake", "auto"),
      (10L, "engine car brake wheel", "auto"),
      (3L, "car engine brake", "auto"),
      (7L, "wheel fast car", "auto")
    ).toDF("doc_id", "text", "source").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val conf = TextAnalysis.textNbClassifier(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(conf.toSet == Set(("auto", "auto", 2L), ("fruit", "fruit", 2L)),
      s"confusion not diagonal: ${conf.toSeq}")
  }

  test("lm generate: over-budget fallback (per-step frontier walk) equals the collected-map walk") {
    val viaMap = TextAnalysis.lmGenerate(spark, sf0001, TextAnalysis.lmSuccBudget)
      .collect().map(_.toSeq).toSeq
    // budget 1 < vocab size forces the degraded route end-to-end
    val viaSteps = TextAnalysis.lmGenerate(spark, sf0001, 1)
      .collect().map(_.toSeq).toSeq
    assert(viaMap == viaSteps)
    // the session conf reaches the driver query: forcing the fallback
    // through spark.graft.lm.succBudget yields the same sequence
    spark.conf.set(TextAnalysis.lmSuccBudgetConf, "1")
    try {
      val viaConf = TextAnalysis.textLmGenerate(spark, sf0001).collect().map(_.toSeq).toSeq
      assert(viaMap == viaConf)
    } finally spark.conf.unset(TextAnalysis.lmSuccBudgetConf)
  }

  test("lm generate: starts at the modal unigram and every step follows the argmax successor") {
    import org.apache.spark.sql.functions._
    val seq0 = TextAnalysis.textLmGenerate(spark, sf0001).collect()
      .sortBy(_.getInt(0)).map(_.getString(1))
    assert(seq0.length == TextAnalysis.lmGenSteps + 1)
    val toks = graft.tables.Tables.documents(spark, sf0001)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
    val top = toks.groupBy(col("token")).count()
      .orderBy(col("count").desc, col("token")).head().getString(0)
    assert(seq0.head == top, s"start ${seq0.head} != modal unigram $top")
    // spot-check one transition against a direct bigram argmax
    val succ = toks.alias("a")
      .join(toks.alias("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.pos") + 1 === col("b.pos"))
      .filter(col("a.token") === seq0(0))
      .groupBy(col("b.token")).count()
      .orderBy(col("count").desc, col("b.token")).head().getString(0)
    assert(seq0(1) == succ, s"step 1 ${seq0(1)} != argmax successor $succ")
  }

  test("heaps fit: every-token-new corpus fits beta = 1, ln K = 0 exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-heaps").toString
    // 100 one-token docs, all tokens distinct → V(N) = N at every
    // checkpoint → the ln-ln OLS is the identity line
    (0 until 100).map(i => (i.toLong, s"tok$i"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.textHeapsFit(spark, dir).head()
    assert(r.getLong(0) == 100, s"checkpoints ${r.getLong(0)}")
    assert(r.getDouble(1) == 1.0, s"beta ${r.getDouble(1)}")
    assert(r.getDouble(2) == 0.0, s"ln_k ${r.getDouble(2)}")
  }

  test("quantile norm: monotone within source, extremes map to corpus extremes") {
    val rows = TextAnalysis.textQuantileNorm(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val corpusMin = rows.map(_._3).min; val corpusMax = rows.map(_._3).max
    rows.groupBy(_._2).foreach { case (src, g) =>
      val byRank = g.sortBy(_._4)
      // normalization preserves the within-source order
      assert(byRank.map(_._5).toSeq == byRank.map(_._5).sorted.toSeq, s"$src: non-monotone")
      // rank 1 → corpus minimum, rank n → corpus maximum
      assert(byRank.head._5 == corpusMin, s"$src: min maps to ${byRank.head._5}")
      assert(byRank.last._5 == corpusMax, s"$src: max maps to ${byRank.last._5}")
    }
  }

  test("dsir: target-vocabulary raw docs score positive, raw-only-vocabulary docs negative") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    // src0 is the target pool; doc 100 reuses its bigrams, doc 101 uses
    // vocabulary the target has never seen
    Seq(
      (0L, "alpha beta alpha beta alpha beta", "src0"),
      (1L, "alpha beta gamma alpha beta", "src0"),
      (100L, "alpha beta alpha beta", "src9"),
      (101L, "zulu yankee zulu yankee zulu", "src9")
    ).toDF("doc_id", "text", "source").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.textDsir(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getInt(3))).toMap
    assert(rows.keySet == Set(100L, 101L), s"scored docs ${rows.keySet}, want the raw pool only")
    assert(rows(100L)._2 == 1 && rows(100L)._1 > 0, s"target-like doc not kept: ${rows(100L)}")
    assert(rows(101L)._2 == 0 && rows(101L)._1 < 0, s"off-vocab doc not rejected: ${rows(101L)}")
  }
}
