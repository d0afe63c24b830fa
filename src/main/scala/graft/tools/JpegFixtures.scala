package graft.tools

import graft.mm.{Jpeg, Multimodal}

import java.nio.file.{Files, Paths}

/** One-shot fixture generator for the JPEG family (run locally, output
  * committed): renders the deterministic [[Jpeg.JpegSynth]] images,
  * encodes them through the JDK JPEG writer into `fixtures/jpeg/`, then
  * DECODES THE WRITTEN BYTES BACK and dumps the golden CSVs the DuckDB
  * oracles read. Also prints the pairwise aHash hamming matrix so the
  * planted-near-dup margins are visible at generation time.
  *
  * No Spark involved — pure JDK codec work; the committed bytes are the
  * contract, not this generator's determinism.
  */
object JpegFixtures {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get(Jpeg.fixturesDir)
    Files.createDirectories(dir)

    Jpeg.JpegSynth.allIds.foreach { id =>
      val f = dir.resolve(s"img_$id.jpg")
      if (!Files.exists(f)) {
        val bytes = Multimodal.ImageCodec.encode(Jpeg.JpegSynth.render(id), "jpg")
        Files.write(f, bytes)
        println(s"wrote $f (${bytes.length} bytes)")
      } else println(s"kept  $f")
    }

    // goldens: decode the COMMITTED bytes (not the in-memory renders)
    val decoded = Jpeg.JpegSynth.allIds.map { id =>
      val bytes          = Files.readAllBytes(dir.resolve(s"img_$id.jpg"))
      val (img, fmt)     = Multimodal.ImageCodec.decode(bytes)
      val (w, h, c, sum) = Multimodal.ImageCodec.stats(img)
      (id, w, h, c, fmt, sum, sum / (w.toLong * h * c), Multimodal.ahash64(img))
    }

    val goldens = "img_id,width,height,channels,format,pix_sum,mean_intensity\n" +
      decoded.map { case (id, w, h, c, f, s, m, _) => s"$id,$w,$h,$c,$f,$s,$m" }.mkString("\n") + "\n"
    Files.writeString(Paths.get(Jpeg.goldensCsv), goldens)
    println(s"wrote ${Jpeg.goldensCsv}")

    // pairwise hamming matrix + the pair set under the query's threshold
    val hs = decoded.map(d => (d._1, d._8))
    val pairs = for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb)
    } yield (a, b, d)
    pairs.filter(_._3 <= 8).sortBy(p => (p._1, p._2)).foreach { case (a, b, d) =>
      println(f"hamming($a%3d, $b%3d) = $d")
    }
    val kept = pairs.filter(_._3 <= Multimodal.ahashMaxHamming).sortBy(p => (p._1, p._2))
    val csv = "img_a,img_b,hamming\n" +
      kept.map { case (a, b, d) => s"$a,$b,$d" }.mkString("\n") + "\n"
    Files.writeString(Paths.get(Jpeg.ahashCsv), csv)
    println(s"wrote ${Jpeg.ahashCsv}: ${kept.length} pairs under <= ${Multimodal.ahashMaxHamming}")
    val planted = Jpeg.JpegSynth.baseIds.map(b => (b, b + 100))
    val missing = planted.filterNot { case (a, b) => kept.exists(p => p._1 == a && p._2 == b) }
    if (missing.nonEmpty) println(s"WARNING: planted pairs missing from kept set: $missing")
    else println("all 8 planted near-dup pairs kept")
  }
}
