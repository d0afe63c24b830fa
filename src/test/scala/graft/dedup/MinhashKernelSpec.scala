package graft.dedup

import graft.SparkSpec

/** The fused minhash kernel must be BIT-identical to the
  * shingleSet+per-seed-hash64 formulation it replaced — corpus-wide and
  * on the adversarial tokenization edges (the signature dumps feed the
  * boundary oracles, so a single differing long breaks driver hashes).
  */
class MinhashKernelSpec extends SparkSpec {

  private val k = Dedup.numPerms

  private def reference(text: String): Seq[Long] =
    Hashing.minhashSignature(Hashing.shingleSet(text).toSeq, k).toSeq

  private def fused(text: String): Seq[Long] =
    Hashing.minhashSignatureOfText(text, k).toSeq

  test("edge cases: empty, short, repeated shingles, spaces, unicode") {
    val cases = Seq(
      null,
      "",
      " ",
      "   ",
      "one two",
      "one two three",
      "a b c d e f",
      "dup dup dup dup dup dup",            // duplicate shingles (multiplicity invariance)
      " leading space doc",
      "trailing space doc ",
      "double  space  doc here",
      "ünïcødé tökens höhö in the mix",
      "日本語 テキスト の 場合 です ね"
    )
    cases.foreach { c =>
      assert(fused(c) == reference(c), s"mismatch on ${Option(c).getOrElse("<null>")}")
    }
  }

  test("corpus-wide equality at sf0.001") {
    val texts = graft.tables.Tables
      .documents(spark, sf0001)
      .select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    texts.foreach { case (id, t) =>
      assert(fused(t) == reference(t), s"doc $id")
    }
  }
}
