package graft.text

import graft.SparkSpec

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

  test("fingerprint md5 matches exact-dedup content hash semantics") {
    val fp = TextAnalysis.textFingerprint(spark, sf0001).collect()
    assert(fp.map(_.getString(1)).distinct.length <= fp.length)
    assert(fp.forall(_.getString(1).length == 32))
  }
}
