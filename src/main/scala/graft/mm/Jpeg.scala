package graft.mm

import graft.syntax._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.awt.image.BufferedImage

/** Lossy-codec (JPEG) support for the image family. PNG/BMP round trips
  * are integer-exact, so their oracles re-derive pixel sums from doc_id
  * arithmetic ([[Multimodal]]); a lossy DCT codec cannot be replayed
  * cross-engine, so the JPEG family is anchored the only sound way:
  * '''golden fixtures''' — committed JPEG bytes under
  * `fixtures/jpeg/` decoded by the real JDK `javax.imageio` JPEG reader,
  * with the decoded pixel statistics pinned against committed golden
  * CSVs (`fixtures/jpeg_goldens.csv`, `fixtures/jpeg_ahash_goldens.csv`)
  * that the DuckDB oracle reads verbatim. Independent (non-golden)
  * anchors live in JpegSpec: decoded dimensions/bands must equal the
  * render parameters (header facts, lossless even under JPEG), the
  * decoded mean intensity must sit within a small tolerance of the
  * pre-encode source mean, and every PLANTED near-duplicate pair
  * (brightness-shifted copy — aHash's integer mean threshold is exactly
  * shift-invariant, so only codec noise separates the hashes) must
  * surface in `mm_ahash_jpeg`.
  *
  * Fixture provenance: [[graft.tools.JpegFixtures]] renders 16
  * deterministic gradient images (8 bases with well-separated gradient
  * directions, sized 32–72 px, gray and 3-band alternating; 8 planted
  * +6-brightness copies), encodes them through the JDK JPEG writer, and
  * dumps the goldens by decoding the committed bytes back. Re-running it
  * is idempotent over the committed fixtures.
  *
  * 100 TB notes: identical shape to the PNG/BMP paths — blobs arrive as
  * a binary column (`binaryFile` source here; a parquet blob column in
  * production), decode is map-only `mapPartitions` with one codec per
  * partition, and the near-dup join is the same pigeonhole band
  * machinery as `mm_ahash`/`dedup_simhash_pairs` (candidates share a
  * 16-bit band; complete for hamming < 4).
  */
object Jpeg {
  type Q = (SparkSession, String) => DataFrame

  val fixturesDir = "/root/repo/fixtures/jpeg"
  val goldensCsv  = "/root/repo/fixtures/jpeg_goldens.csv"
  val ahashCsv    = "/root/repo/fixtures/jpeg_ahash_goldens.csv"

  /** Deterministic synthetic JPEG source images — smooth integer
    * gradients (JPEG-friendly: minimal ringing), one well-separated
    * direction per base so distinct bases land far apart in aHash space.
    */
  object JpegSynth {
    val baseIds: Seq[Long] = 0L until 8L
    /** copy id 100+b is base b shifted +6 in every sample */
    val copyIds: Seq[Long] = baseIds.map(_ + 100L)
    val allIds:  Seq[Long] = baseIds ++ copyIds

    private val dirs = Array((1, 0), (2, 1), (1, 1), (1, 2), (0, 1), (-1, 2), (-1, 1), (-2, 1))

    def baseOf(id: Long): Long  = if (id >= 100) id - 100 else id
    def width(id: Long): Int    = 40 + 8 * (baseOf(id) % 5).toInt
    def height(id: Long): Int   = 32 + 8 * ((baseOf(id) / 5) % 5).toInt
    def channels(id: Long): Int = if (baseOf(id) % 2 == 0) 3 else 1
    def shift(id: Long): Int    = if (id >= 100) 6 else 0

    /** 10..230 linear ramp along direction `dirs(base)`, +shift for
      * planted copies (never clips: 10+6+220 < 255).
      */
    def pixel(id: Long, x: Int, y: Int): Int = {
      val b      = baseOf(id).toInt
      val (p, q) = dirs(b)
      val w      = width(id)
      val h      = height(id)
      val corners = Seq(0, p * (w - 1), q * (h - 1), p * (w - 1) + q * (h - 1))
      val lo      = corners.min
      val hi      = corners.max
      val span    = math.max(hi - lo, 1)
      10 + ((p * x + q * y - lo) * 220) / span + shift(id)
    }

    def render(id: Long): BufferedImage =
      Multimodal.ImageSynth.render(width(id), height(id), channels(id))(pixel(id, _, _))

    /** Exact mean of the SOURCE raster (pre-encode) — the independent
      * plausibility anchor for the lossy decode.
      */
    def sourceMean(id: Long): Double = {
      val (w, h) = (width(id), height(id))
      var sum    = 0L
      var y      = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += pixel(id, x, y); x += 1 }
        y += 1
      }
      sum.toDouble / (w.toLong * h)
    }
  }

  /** Committed JPEG fixture blobs: (img_id, blob). binaryFile is the
    * DSv1 binary source (path + content columns); img_id parses from the
    * committed file name `img_<id>.jpg`.
    */
  def jpegBlobs(s: SparkSession): DataFrame =
    s.read
      .format("binaryFile")
      .load(fixturesDir)
      .select(
        regexp_extract(col("path"), "img_(\\d+)\\.jpg$", 1).cast("long").as("img_id"),
        col("content").as("blob")
      )

  /** Decode the committed JPEG bytes: every output column comes from the
    * signature-matched `javax.imageio` JPEG reader and the decoded
    * raster (schema = [[Multimodal.decodedSchema]] with img_id).
    */
  val mmDecodeJpeg: Q = (s, _) =>
    Multimodal.decodeStats(jpegBlobs(s), "img_id").orderBy($"img_id")

  /** aHash over the decoded JPEG rasters — identical pipeline to
    * [[Multimodal.mmAhash]] (8×8 NN resample of band 0, integer-mean
    * threshold, 64-bit pack, 4×16-bit pigeonhole bands, exact hamming64
    * verify), routed over the lossy codec. Planted +6-brightness copies
    * differ from their base only by codec noise (the threshold is
    * shift-exact), so each must pair within the hamming budget.
    */
  val mmAhashJpeg: Q = (s, _) => {
    val hashSchema = StructType(
      Seq(StructField("img_id", LongType), StructField("ahash", LongType))
    )
    val enc = org.apache.spark.sql.Encoders.row(hashSchema)
    val hashes = jpegBlobs(s)
      .mapPartitions { rows =>
        rows.map { r =>
          val (img, _) = Multimodal.ImageCodec.decode(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), Multimodal.ahash64(img))
        }
      }(enc)
    Multimodal.ahashPairs(s, hashes, "img_id", "img_a", "img_b")
  }

  val queries: Map[String, Q] = Map(
    "mm_decode_jpeg" -> mmDecodeJpeg,
    "mm_ahash_jpeg"  -> mmAhashJpeg
  )

  /** Golden-fixture oracles: DuckDB reads the committed golden CSVs the
    * fixture generator dumped from decoding the committed bytes — the
    * driver hash gate then pins the whole decode chain against them.
    */
  val oracles: Map[String, String] = Map(
    "mm_decode_jpeg" ->
      s"""SELECT CAST(img_id AS BIGINT) AS img_id, CAST(width AS INT) AS width,
        |  CAST(height AS INT) AS height, CAST(channels AS INT) AS channels,
        |  CAST(format AS VARCHAR) AS format, CAST(pix_sum AS BIGINT) AS pix_sum,
        |  CAST(mean_intensity AS BIGINT) AS mean_intensity
        |FROM read_csv('$goldensCsv', header=true) ORDER BY img_id""".stripMargin,
    "mm_ahash_jpeg" ->
      s"""SELECT CAST(img_a AS BIGINT) AS img_a, CAST(img_b AS BIGINT) AS img_b,
        |  CAST(hamming AS INT) AS hamming
        |FROM read_csv('$ahashCsv', header=true) ORDER BY img_a, img_b""".stripMargin
  )
}
