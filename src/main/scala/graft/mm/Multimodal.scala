package graft.mm

import graft.syntax._
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing — image/audio/video as opaque `binary`
  * columns with typed metadata (builder brief).
  *
  * The real content here is the Spark-side shape, all of which is genuine
  * and tested: binary columns flowing through parquet-friendly schemas,
  * deterministic partition-parallel batch decode via `mapPartitions`
  * (Scala's analog of the Python `mapInPandas` batch UDF: one iterator per
  * partition, amortized per-batch setup), and a typed metadata struct.
  * The codec itself is STUBBED — `FakeCodec.decode` derives metadata
  * deterministically from the bytes (the image/audio libraries are not in
  * this container); swap it for a real decoder without touching any of
  * the plumbing.
  *
  * 100 TB notes: blobs ride in their own column chunk (columnar pruning
  * keeps metadata-only queries from reading bytes); decode is map-only;
  * `spark.sql.files.maxPartitionBytes` bounds per-task batch memory.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** STUB decoder — deterministic fake: metadata is a pure function of
    * the blob bytes, standing in for an image decode.
    */
  object FakeCodec {
    def decode(blob: Array[Byte]): (Int, Int, Int, String) = {
      val n = blob.length
      val width  = 64 + (n % 512)
      val height = 64 + ((n / 7) % 512)
      val channels = if (n % 2 == 0) 3 else 1
      val format = if (n % 3 == 0) "png" else "jpeg"
      (width, height, channels, format)
    }
  }

  val decodedSchema: StructType = StructType(
    Seq(
      StructField("doc_id", LongType),
      StructField("byte_len", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("format", StringType)
    )
  )

  /** The corpus as a blob table: text bytes standing in for media bytes. */
  def blobs(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .select($"doc_id", $"text".cast("binary").as("blob"), $"source")

  /** Metadata-only pass — never decodes, never needs the blob bytes
    * beyond length/digest (oracle-checked).
    */
  val mmMetadata: Q = (s, d) =>
    blobs(s, d)
      .select(
        $"doc_id",
        octet_length($"blob").as("byte_len"),
        md5($"blob").as("content_md5"),
        $"source"
      )
      .orderBy($"doc_id")

  /** Batch decode via mapPartitions — partition-parallel, one codec
    * "session" per partition (the per-batch-setup pattern of mapInPandas).
    */
  val mmDecode: Q = (s, d) => {
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    blobs(s, d)
      .select($"doc_id", $"blob")
      .mapPartitions { rows =>
        // per-partition setup would open the real codec here
        rows.map { r =>
          val id   = r.getLong(0)
          val blob = r.getAs[Array[Byte]](1)
          val (w, h, c, f) = FakeCodec.decode(blob)
          Row(id, blob.length, w, h, c, f)
        }
      }(enc)
      .orderBy($"doc_id")
  }

  /** Frame sampling — the video analog: treat the blob as fixed-size
    * frame blocks, emit every `stride`-th block with its offset (the
    * extraction plumbing for "sample 1 fps"-style pipelines). posexplode
    * keeps it one codegen'd scan; at scale the sampled frames land
    * partitioned by doc for downstream batch decode.
    */
  val frameSize = 64
  val stride    = 4

  val mmFrameSample: Q = (s, d) => {
    blobs(s, d)
      .select(
        $"doc_id",
        posexplode(
          filter(
            transform(
              sequence(lit(0), floor((octet_length($"blob") - 1) / (frameSize * stride)).cast("int")),
              i => substring($"blob", (i * frameSize * stride + 1).cast("int"), lit(frameSize))
            ),
            f => octet_length(f) > 0
          )
        ).as(Seq("frame_idx", "frame"))
      )
      .select(
        $"doc_id",
        $"frame_idx",
        octet_length($"frame").as("frame_bytes"),
        md5($"frame").as("frame_md5")
      )
      .orderBy($"doc_id", $"frame_idx")
  }

  /** Resize stub — 2:1 stride subsample of the blob (every other byte),
    * halving the fake decode dimensions: the pixel-resample op's exact
    * plumbing (map-only, blob→blob, metadata recomputed). The byte
    * subsample is a regex pair-reduction, portable to the oracle.
    */
  val mmResize: Q = (s, d) => {
    val half = regexp_replace($"text", "(.).", "$1")
    // single pass: select blob AND text together instead of re-joining
    // blobs back to documents for a column it just cast away
    Tables
      .documents(s, d)
      .select($"doc_id", $"text".cast("binary").as("blob"), $"text")
      .select(
        $"doc_id",
        octet_length($"blob").as("orig_bytes"),
        octet_length(half.cast("binary")).as("resized_bytes"),
        floor((lit(64) + octet_length($"blob") % 512) / 2).cast("int").as("resized_width"),
        floor((lit(64) + floor(octet_length($"blob") / 7) % 512) / 2).cast("int").as("resized_height"),
        md5(half.cast("binary")).as("resized_md5")
      )
      .orderBy($"doc_id")
  }

  /** Stop-frame cap: frames shared by more than this many docs are
    * excluded from pair generation (the "black frame" problem — one
    * ubiquitous frame would otherwise quadratically dominate the join).
    */
  val frameCap = 100

  /** Cross-document duplicated-segment detection — the video-pipeline
    * "reused footage" op: sampled frames joined on content hash, counted
    * per doc pair. The inverted-index join is the dedup family's shape:
    * per-doc DISTINCT frames first (within-doc repeats must not multiply
    * counts), a hot-bucket cap riding the join's own frame_md5 shuffle
    * (the window count and the self-join share one exchange), then a
    * pair count. At 100 TB every stage is bounded: frames per doc by the
    * stride, bucket width by [[frameCap]], so the join does O(Σ bucket²)
    * work with buckets ≤ cap.
    */
  val mmFrameDedup: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"frame_md5")
    val f = blobs(s, d)
      .select(
        $"doc_id",
        explode(
          filter(
            transform(
              sequence(lit(0), floor((octet_length($"blob") - 1) / (frameSize * stride)).cast("int")),
              i => substring($"blob", (i * frameSize * stride + 1).cast("int"), lit(frameSize))
            ),
            fr => octet_length(fr) > 0
          )
        ).as("frame")
      )
      .select($"doc_id", md5($"frame").as("frame_md5"))
      .distinct()
      .withColumn("grp_n", count(lit(1)).over(w))
      .filter($"grp_n" <= frameCap)
      .select($"doc_id", $"frame_md5")
    f.as("x")
      .join(
        f.as("y"),
        col("x.frame_md5") === col("y.frame_md5") && col("x.doc_id") < col("y.doc_id")
      )
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_frames"))
      .orderBy($"doc_a", $"doc_b")
  }

  val queries: Map[String, Q] = Map(
    "mm_metadata"     -> mmMetadata,
    "mm_decode"       -> mmDecode,
    "mm_frame_sample" -> mmFrameSample,
    "mm_frame_dedup"  -> mmFrameDedup,
    "mm_resize"       -> mmResize
  )

  /** The corpus is ASCII, so byte-level blob semantics are expressible
    * over VARCHAR in DuckDB — even the STUB decode (pure integer
    * arithmetic on byte length) and strided frame extraction get full
    * oracles.
    */
  val oracles: Map[String, String] = Map(
    "mm_metadata" ->
      """SELECT doc_id, CAST(strlen(text) AS INT) AS byte_len,
        |  md5(text) AS content_md5, source
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_decode" ->
      """SELECT doc_id,
        |  CAST(strlen(text) AS INT) AS byte_len,
        |  CAST(64 + strlen(text) % 512 AS INT) AS width,
        |  CAST(64 + (strlen(text) // 7) % 512 AS INT) AS height,
        |  CAST(CASE WHEN strlen(text) % 2 = 0 THEN 3 ELSE 1 END AS INT) AS channels,
        |  CASE WHEN strlen(text) % 3 = 0 THEN 'png' ELSE 'jpeg' END AS format
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_resize" ->
      """SELECT doc_id,
        |  CAST(strlen(text) AS INT) AS orig_bytes,
        |  CAST(strlen(regexp_replace(text, '(.).', '\1', 'g')) AS INT) AS resized_bytes,
        |  CAST(floor((64 + strlen(text) % 512) / 2.0) AS INT) AS resized_width,
        |  CAST(floor((64 + (strlen(text) // 7) % 512) / 2.0) AS INT) AS resized_height,
        |  md5(regexp_replace(text, '(.).', '\1', 'g')) AS resized_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """WITH idx AS (
        |  SELECT doc_id, text,
        |    unnest(range(0, CAST(floor((strlen(text) - 1) / 256.0) AS INT) + 1)) AS i
        |  FROM documents)
        |SELECT doc_id, CAST(i AS INT) AS frame_idx,
        |  CAST(strlen(substring(text, CAST(i * 256 + 1 AS INT), 64)) AS INT) AS frame_bytes,
        |  md5(substring(text, CAST(i * 256 + 1 AS INT), 64)) AS frame_md5
        |FROM idx
        |WHERE strlen(substring(text, CAST(i * 256 + 1 AS INT), 64)) > 0
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "mm_frame_dedup" ->
      s"""WITH idx AS (
         |  SELECT doc_id, text,
         |    unnest(range(0, CAST(floor((strlen(text) - 1) / 256.0) AS INT) + 1)) AS i
         |  FROM documents),
         |fr AS (
         |  SELECT DISTINCT doc_id,
         |    md5(substring(text, CAST(i * 256 + 1 AS INT), 64)) AS frame_md5
         |  FROM idx
         |  WHERE strlen(substring(text, CAST(i * 256 + 1 AS INT), 64)) > 0),
         |capped AS (
         |  SELECT doc_id, frame_md5 FROM fr
         |  QUALIFY COUNT(*) OVER (PARTITION BY frame_md5) <= $frameCap)
         |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |  CAST(COUNT(*) AS BIGINT) AS shared_frames
         |FROM capped x JOIN capped y
         |  ON x.frame_md5 = y.frame_md5 AND x.doc_id < y.doc_id
         |GROUP BY 1, 2 ORDER BY doc_a, doc_b""".stripMargin
  )
}
