package graft.mm

import graft.SparkSpec
import java.util.Base64

class MultimodalSpec extends SparkSpec {

  test("blob metadata pass never decodes; byte_len matches text length") {
    val rows = Multimodal.mmMetadata(spark, sf0001).collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getInt(1) > 0))
  }

  test("ASCII corpus pin: byte framing == char framing for every document") {
    // mm_frame_sample's engine slices BYTES while its oracle slices VARCHAR
    // characters — equal only while the corpus is pure ASCII. Pin it.
    import org.apache.spark.sql.functions._
    val nonAscii = graft.tables.Tables
      .documents(spark, sf0001)
      .filter(octet_length(col("text")) =!= char_length(col("text")))
      .count()
    assert(nonAscii == 0L)
  }

  // Golden fixtures: bytes produced by TODAY's encoder, committed as
  // constants. If the synth formulas, the raster fill, or the JDK codec
  // behavior ever drift, the byte-equality half catches the encode side
  // and the stats half catches the decode side independently.
  val goldenDoc0 = // 4×4, 3-band BMP, pixel (x*7+y*13)%256
    "Qk1mAAAAAAAAADYAAAAoAAAABAAAAAQAAAABABgAAAAAADAAAAAAAAAAAAAAAAAAAAAAAAAAJycnLi4uNTU1PDw8GhoaISEhKCgoLy8vDQ0NFBQUGxsbIiIiAAAABwcHDg4OFRUV"
  val goldenDoc1 = // 5×4, 1-band PNG, pixel (31+x*7+y*13)%256
    "iVBORw0KGgoAAAANSUhEUgAAAAUAAAAECAAAAABjWKqcAAAAIElEQVR4XmOQV9M1sWbQMbZy9GCwdHD3C2Vw8w2JTgIAM9oFC9HzmQUAAAAASUVORK5CYII="
  val goldenFrame85 = // 8×8 gray PNG frame for key 85 (key-stamped pixels)
    "iVBORw0KGgoAAAANSUhEUgAAAAgAAAAICAAAAADhZOFXAAAAU0lEQVR4XgFIALf/AFUAWWBnbnV8AFhfZm10e4KJAGVsc3qBiI+WAHJ5gIeOlZyjAH+GjZSboqmwAIyTmqGor7a9AJmgp661vMPKAKattLvCydDXYx4j+TpooFMAAAAASUVORK5CYII="

  test("golden fixtures: encoder reproduces committed bytes; decoder reads exact stats") {
    val b0 = Base64.getDecoder.decode(goldenDoc0)
    val b1 = Base64.getDecoder.decode(goldenDoc1)
    val bf = Base64.getDecoder.decode(goldenFrame85)
    assert(Multimodal.ImageSynth.blobFor(0L).sameElements(b0))
    assert(Multimodal.ImageSynth.blobFor(1L).sameElements(b1))
    assert(Multimodal.frameBlob(85L).sameElements(bf))
    val (i0, f0) = Multimodal.ImageCodec.decode(b0)
    assert(f0 == "bmp" && Multimodal.ImageCodec.stats(i0) == ((4, 4, 3, 1440L)))
    val (i1, f1) = Multimodal.ImageCodec.decode(b1)
    assert(f1 == "png" && Multimodal.ImageCodec.stats(i1) == ((5, 4, 1, 1290L)))
    val (ifr, ffr) = Multimodal.ImageCodec.decode(bf)
    assert(ffr == "png" && Multimodal.ImageCodec.stats(ifr) == ((8, 8, 1, 9208L)))
  }

  test("frame raster is injective over the full key range (md5 ⇔ key)") {
    // without the key stamp, keys 256 apart collide (31k is a bijection
    // of Z/256); the dedup oracle joins on keys, the engine on digests —
    // the two agree only if key → bytes is injective
    val keyRange = 0 until (16 * Multimodal.frameKeyMod)
    val digests = keyRange.map(k =>
      java.util.Arrays.hashCode(Multimodal.frameBlob(k.toLong)))
    assert(digests.distinct.length == keyRange.length)
  }

  test("real decode round trip matches the synth arithmetic for every doc") {
    val rows = Multimodal.mmDecode(spark, sf0001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      import Multimodal.ImageSynth._
      val (w, h, c) = (width(id), height(id), channels(id))
      var ps = 0L
      for (y <- 0 until h; x <- 0 until w) ps += c.toLong * pixel(id, x, y)
      assert(r.getInt(1) == w && r.getInt(2) == h && r.getInt(3) == c)
      assert(r.getString(4) == format(id))
      assert(r.getLong(5) == ps && r.getLong(6) == ps / (w.toLong * h * c))
    }
  }

  test("resize: decode→subsample→encode→decode chain is lossless NN at even coords") {
    val rows = Multimodal.mmResize(spark, sf0001).limit(50).collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      import Multimodal.ImageSynth._
      val (w, h, c) = (width(id), height(id), channels(id))
      val (w2, h2)  = ((w + 1) / 2, (h + 1) / 2)
      var ps = 0L
      for (y <- 0 until h2; x <- 0 until w2) ps += c.toLong * pixel(id, 2 * x, 2 * y)
      assert(r.getInt(3) == w2 && r.getInt(4) == h2 && r.getInt(5) == c)
      assert(r.getLong(6) == ps)
    }
  }

  test("frame dedup on real frame hashes: planted reuse found, hot buckets capped") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fdedup").toString
    // 101 docs ≡ 0 (mod 211): their frames 0..2 land in buckets of 101
    // (> frameCap → excluded); frame 3 exists only for the 80 of them
    // with doc_id % 5 != 0 (bucket 80 ≤ cap → kept). Docs 5 and 216
    // (≡ 5 mod 211) share min(3, 4) = 3 frames in 2-doc buckets.
    val ids = (0 to 100).map(k => 211L * k) ++ Seq(5L, 216L)
    ids.toDF("doc_id")
      .withColumn("text", org.apache.spark.sql.functions.lit("t"))
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars", org.apache.spark.sql.functions.lit(1L))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Multimodal.mmFrameDedup(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out((5L, 216L)) == 3L)       // uncapped residue: full overlap
    assert(out((211L, 1266L)) == 1L)    // only frame 3 survives the cap
    assert(!out.contains((0L, 1055L)))  // 3-frame docs: all buckets capped
  }
}
