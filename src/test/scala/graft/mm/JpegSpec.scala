package graft.mm

import graft.SparkSpec

/** Independent anchors for the lossy-codec family — everything the
  * golden CSVs can NOT provide (they pin regression; these pin
  * plausibility without consulting the goldens):
  *
  *  - header facts survive the lossy round trip exactly: decoded
  *    width/height/bands equal the render parameters;
  *  - the signature-matched reader really is the JPEG reader;
  *  - the decoded mean intensity sits within a small tolerance of the
  *    pre-encode source mean (JPEG preserves the DC average closely);
  *  - every planted +6-brightness near-dup pair surfaces in
  *    `mm_ahash_jpeg`, and no base pairs with a DIFFERENT base's copy;
  *  - the committed blobs of a base and its planted copy are different
  *    bytes (the near-dup is real, not an exact dup).
  */
class JpegSpec extends SparkSpec {

  private lazy val decoded = Jpeg.mmDecodeJpeg(spark, sf0001).collect()

  test("all 16 committed fixtures decode; dimensions and bands equal render params") {
    assert(decoded.length == Jpeg.JpegSynth.allIds.length)
    decoded.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == Jpeg.JpegSynth.width(id), s"width of $id")
      assert(r.getInt(2) == Jpeg.JpegSynth.height(id), s"height of $id")
      assert(r.getInt(3) == Jpeg.JpegSynth.channels(id), s"bands of $id")
      assert(r.getString(4) == "jpeg", s"format of $id")
    }
  }

  test("decoded mean intensity within 2 levels of the pre-encode source mean") {
    decoded.foreach { r =>
      val id  = r.getLong(0)
      val got = r.getLong(6).toDouble
      val src = Jpeg.JpegSynth.sourceMean(id)
      assert(math.abs(got - src) <= 2.0, s"img $id: decoded mean $got vs source $src")
    }
  }

  test("planted near-dup pairs all surface; no cross-base pairs") {
    val pairs = Jpeg
      .mmAhashJpeg(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    Jpeg.JpegSynth.baseIds.foreach { b =>
      assert(pairs.contains((b, b + 100)), s"planted pair ($b, ${b + 100}) missing")
    }
    pairs.foreach { case (a, b) =>
      assert(Jpeg.JpegSynth.baseOf(a) == Jpeg.JpegSynth.baseOf(b), s"cross-base pair ($a, $b)")
    }
  }

  test("planted copies are different bytes from their base (lossy near-dup, not exact dup)") {
    import java.nio.file.{Files, Paths}
    Jpeg.JpegSynth.baseIds.foreach { b =>
      val x = Files.readAllBytes(Paths.get(s"${Jpeg.fixturesDir}/img_$b.jpg"))
      val y = Files.readAllBytes(Paths.get(s"${Jpeg.fixturesDir}/img_${b + 100}.jpg"))
      assert(!java.util.Arrays.equals(x, y), s"img_$b and img_${b + 100} are byte-identical")
    }
  }

  test("goldens CSV agrees with a fresh decode (regression pin is current)") {
    val golden = spark.read
      .option("header", "true")
      .csv(Jpeg.goldensCsv)
      .collect()
      .map(r => r.getString(0).toLong ->
        (r.getString(1).toInt, r.getString(2).toInt, r.getString(3).toInt,
          r.getString(4), r.getString(5).toLong, r.getString(6).toLong))
      .toMap
    assert(golden.size == decoded.length)
    decoded.foreach { r =>
      val id = r.getLong(0)
      assert(
        golden(id) == ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4), r.getLong(5), r.getLong(6))),
        s"golden drift for img $id — re-run graft.tools.JpegFixtures and inspect")
    }
  }
}
