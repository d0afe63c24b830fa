package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL-canonicalization and paragraph-dedup semantics on hand-built
  * inputs (the corpus oracle covers scale; these pin the rule edges).
  */
class WebCurateSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(WebCurate.canonUrl(col("u")).as("c")).collect().map(_.getString(0)).toSeq

  test("canon: case, www, default port, slashes, utm, fragment") {
    val out = canon(
      "HTTPS://WWW.Foo.COM:443/A//B/?utm_a=1&x=2&utm_b=3#frag",
      "http://foo.com:80/",
      "https://foo.com:80/p",          // :80 is NOT https' default — kept
      "https://foo.com/p?utm_only=1",  // all-utm query vanishes
      "https://foo.com/p?a=1&b=2"      // non-utm params preserved in order
    )
    assert(out == Seq(
      "https://foo.com/A/B?x=2",
      "http://foo.com",
      "https://foo.com:80/p",
      "https://foo.com/p",
      "https://foo.com/p?a=1&b=2"
    ))
  }

  test("canon is idempotent over the synth corpus") {
    val docs = Seq.tabulate(120)(i => (i.toLong, s"src${i % 20}")).toDF("doc_id", "source")
    val once  = WebCurate.canonUrl(WebCurate.synthUrl($"source", $"doc_id"))
    val twice = WebCurate.canonUrl(once)
    assert(docs.filter(once =!= twice).count() == 0)
  }

  test("dedup_url merges raw variants of the same page") {
    val dir = java.nio.file.Files.createTempDirectory("graft-url").toString
    // docs 0 and 40 are the same page (doc_id % 40) on the same host with
    // different port/slash/fragment decorations; doc 1 is its own page
    Seq((0L, "src0", "x"), (40L, "src0", "y"), (1L, "src1", "z"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = WebCurate.dedupUrl(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("src0.example.com", 2L, 1L, 1L),
      ("src1.example.com", 1L, 1L, 1L)
    ))
  }

  test("canon is total and idempotent on arbitrary messy URL-ish strings") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // URL-shaped and garbage alike: schemes, hosts, ports, utm runs,
    // repeated slashes, fragments, plus raw fragments of those pieces
    val piece = Gen.oneOf(
      Gen.oneOf("http://", "HTTPS://", "ftp://", "//", ""),
      Gen.oneOf("WWW.", "www.", ""),
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf(":80", ":443", ":8080", ""),
      Gen.oneOf("/", "//", "///", "/a/b", "/A//B/"),
      Gen.oneOf("?", "&", "?utm_x=1", "&utm_=", "?a=1&utm_b=2&c=3", "?utm_a=1&utm_b=2"),
      Gen.oneOf("#", "#frag", "##x", "")
    )
    val messy = Gen.listOfN(6, piece).map(_.mkString)
    val urls = (1 to 300).flatMap(i => messy(Gen.Parameters.default, Seed(i.toLong)))
    val out = urls.toDF("u")
      .select(
        WebCurate.canonUrl(col("u")).as("c1"),
        WebCurate.canonUrl(WebCurate.canonUrl(col("u"))).as("c2")
      )
      .collect()
    assert(out.length == urls.length)
    out.foreach { r =>
      assert(r.getString(0) != null)
      assert(r.getString(0) == r.getString(1), s"not idempotent: ${r.getString(0)}")
    }
  }

  test("dedup_paragraph keeps only the first corpus-wide occurrence") {
    val dir  = java.nio.file.Files.createTempDirectory("graft-para").toString
    val para = (1 to 8).map(i => s"w$i").mkString(" ")
    val other = (1 to 8).map(i => s"v$i").mkString(" ")
    // doc 1 = [para, other]; doc 2 = [para, tail of 3 tokens]
    Seq((1L, "s", s"$para $other"), (2L, "s", s"$para a b c"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = WebCurate.dedupParagraph(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 2L, 16L), (2L, 2L, 1L, 3L)))
  }
}
