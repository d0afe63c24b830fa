package graft.mm

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Pins the corrupt-media semantics of the decode kernels (chaos r11
  * rounds 5-6 + review): undecodable blobs (null / empty / garbage /
  * truncated) are SKIPPED, decodable-but-degenerate clips are skipped by
  * their EXPLICIT guards (empty clip, rate below the decimation factor,
  * clip shorter than the Goertzel window), and valid blobs survive — the
  * generated corpora are always decodable, so without this spec the skip
  * paths would be dead code to every other gate.
  */
class CorruptBlobSpec extends SparkSpec {

  private val blobSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("blob", BinaryType)))

  private def blobDf(rows: (Long, Array[Byte])*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, b) => Row(i, b) }, 2),
      blobSchema)

  test("image decode skips undecodable blobs and keeps exactly the decodable ones") {
    val good = Multimodal.ImageSynth.blobFor(7L)
    val rows = blobDf(
      1L -> null,
      2L -> Array.empty[Byte],
      3L -> "not an image at all".getBytes("UTF-8"),
      4L -> good.take(10), // truncated mid-header
      7L -> good
    )
    val out = Multimodal.decodeStats(rows, "doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(7L))
    // and the surviving row decoded for real (non-degenerate dims)
    assert(out.head.getInt(1) > 0 && out.head.getInt(2) > 0)
  }

  test("audio kernels skip corrupt blobs and degenerate clips via their explicit guards") {
    def wav(sr: Int, xs: Array[Short]) = Audio.WavCodec.encode(sr, 1, xs)
    val good  = wav(8000, Array.tabulate(300)(j => ((j * 37) % 65536 - 32768).toShort))
    val empty = wav(8000, Array.empty[Short])
    val short_ = wav(8000, Array.tabulate(10)(_.toShort)) // < goertzelN frames
    val lowSr  = wav(2, Array.tabulate(300)(_.toShort))   // rate below decimation
    val rows = blobDf(
      1L -> null,
      2L -> "garbage bytes".getBytes("UTF-8"),
      3L -> good.take(8), // truncated RIFF header
      4L -> empty,
      5L -> short_,
      6L -> lowSr,
      7L -> good
    )
    // decode keeps every non-empty decodable clip
    assert(Audio.decodeTable(rows).collect().map(_.getLong(0)).toSeq == Seq(5L, 6L, 7L))
    // resample additionally drops the below-decimation-rate clip
    assert(Audio.resampleTable(rows).collect().map(_.getLong(0)).toSeq == Seq(5L, 7L))
    // goertzel needs >= goertzelN frames (rate is irrelevant to it):
    // the full-length clips survive, the 10-frame clip doesn't
    assert(
      Audio.goertzelTable(rows).select("doc_id").distinct().collect()
        .map(_.getLong(0)).toSeq.sorted == Seq(6L, 7L))
  }

  test("tryDecode is scoped to the codec: decodable empty clip is Some, garbage is None") {
    assert(Audio.tryDecode(null).isEmpty)
    assert(Audio.tryDecode("junk".getBytes("UTF-8")).isEmpty)
    val empty = Audio.WavCodec.encode(8000, 1, Array.empty[Short])
    assert(Audio.tryDecode(empty).exists(_._3.isEmpty))
  }
}
