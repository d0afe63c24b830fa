package graft.mm

import graft.syntax._
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.{ByteBuffer, ByteOrder}

/** Audio-column plumbing — the WAV/RIFF analog of [[Multimodal]]'s image
  * family (builder brief: image/AUDIO/video as opaque binary columns).
  *
  * The codec is REAL: a spec-conformant RIFF/WAVE writer and a generic
  * chunk-walking PCM16 reader (RIFF is a public container format; the
  * JDK's own `javax.sound.sampled` reads the emitted bytes, which
  * AudioSpec uses as an independent decoder cross-check). As with the
  * image family the corpus ships no media bytes, so the blob table is
  * generated: per document a deterministic PCM16 waveform whose sample
  * rate, channel count, frame count and every interleaved sample are
  * pure integer functions of `doc_id` ([[AudioSynth]]). One in five
  * blobs carries a LIST metadata chunk BEFORE the data chunk — planted
  * non-canonical-but-legal chunk layouts, so a decoder that assumes the
  * 44-byte header instead of walking chunks hash-fails on the driver
  * query itself, not just in a spec.
  *
  * The decode side sees only the encoded bytes; the DuckDB oracles
  * re-derive sample-rate/channels/frame-count/peak/abs-sum from the
  * `doc_id` arithmetic alone (no codec anywhere), so the entire
  * encode→decode round trip is value-exact end to end. All derived
  * stats stay in integer space (milli-units via *1000 floor division) —
  * no float rounding discipline needed.
  *
  * 100 TB notes: same shape as the image family — blobs in their own
  * column chunk, decode map-only in `mapPartitions`, per-task memory
  * bounded by `maxPartitionBytes`; resample is decode→decimate→encode→
  * decode in one map pass (no shuffle until the final presentation
  * sort, which a real pipeline would drop).
  */
object Audio {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic synthetic waveform parameters — pure integer
    * functions of `doc_id`, replayed verbatim by the DuckDB oracles.
    * Samples are indexed in INTERLEAVED order (j = frame*channels + ch),
    * exactly the order PCM16 lays them on the wire.
    */
  object AudioSynth {
    def sampleRate(id: Long): Int = if (id % 2 == 0) 16000 else 8000
    def channels(id: Long): Int   = if (id % 3 == 0) 2 else 1
    def nFrames(id: Long): Int    = (256 + id % 191).toInt // 256..446
    def hasListChunk(id: Long): Boolean = id % 5 == 0
    def sample(id: Long, j: Int): Int =
      (((id * 7919 + j.toLong * 104729) % 65536) - 32768).toInt

    /** The real encoded RIFF/WAVE blob for one document. */
    def blobFor(id: Long): Array[Byte] = {
      val n  = nFrames(id) * channels(id)
      val xs = Array.tabulate(n)(j => sample(id, j).toShort)
      WavCodec.encode(sampleRate(id), channels(id), xs, withListChunk = hasListChunk(id))
    }
  }

  /** RIFF/WAVE PCM16 little-endian codec. The writer emits canonical
    * chunks (plus an optional LIST/INFO chunk before data); the reader
    * walks the chunk sequence generically — fmt and data are found by
    * their four-character tags, unknown chunks are skipped with RIFF's
    * odd-size pad byte honored — never by byte offset.
    */
  object WavCodec {
    private val listPayload: Array[Byte] =
      "INFOISFT".getBytes("US-ASCII") ++ "graft!".getBytes("US-ASCII") // even length

    def encode(
        sampleRate: Int,
        channels: Int,
        samples: Array[Short],
        withListChunk: Boolean = false
    ): Array[Byte] = {
      val dataLen  = samples.length * 2
      val listLen  = if (withListChunk) 8 + listPayload.length else 0
      val riffLen  = 4 + (8 + 16) + listLen + (8 + dataLen)
      val bb       = ByteBuffer.allocate(8 + riffLen).order(ByteOrder.LITTLE_ENDIAN)
      def tag(t: String): Unit = bb.put(t.getBytes("US-ASCII"))
      tag("RIFF"); bb.putInt(riffLen); tag("WAVE")
      tag("fmt "); bb.putInt(16)
      bb.putShort(1)                                  // PCM
      bb.putShort(channels.toShort)
      bb.putInt(sampleRate)
      bb.putInt(sampleRate * channels * 2)            // byte rate
      bb.putShort((channels * 2).toShort)             // block align
      bb.putShort(16)                                 // bits per sample
      if (withListChunk) { tag("LIST"); bb.putInt(listPayload.length); bb.put(listPayload) }
      tag("data"); bb.putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

    /** bytes → (sampleRate, channels, interleaved samples). */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
      }
      require(tag() == "RIFF", "not a RIFF container")
      bb.getInt // riff payload length
      require(tag() == "WAVE", "not a WAVE form")
      var sr      = -1
      var ch      = -1
      var samples = null: Array[Short]
      while (bb.remaining() >= 8) {
        val id = tag()
        val sz = bb.getInt
        id match {
          case "fmt " =>
            val fmtCode = bb.getShort
            require(fmtCode == 1, s"not PCM (fmt=$fmtCode)")
            ch = bb.getShort.toInt
            sr = bb.getInt
            bb.getInt; bb.getShort // byte rate, block align
            val bits = bb.getShort
            require(bits == 16, s"not 16-bit ($bits)")
            bb.position(bb.position() + (sz - 16)) // cbSize extension, if any
          case "data" =>
            samples = Array.fill(sz / 2)(bb.getShort)
          case _ =>
            bb.position(bb.position() + sz)
        }
        if (sz % 2 == 1 && bb.remaining() > 0) bb.get // RIFF word-align pad
      }
      require(sr > 0 && ch > 0 && samples != null, "missing fmt or data chunk")
      (sr, ch, samples)
    }
  }

  private val blobSchema = StructType(
    Seq(StructField("doc_id", LongType), StructField("blob", BinaryType))
  )

  /** The generated audio table: one REAL encoded WAV blob per document
    * (partition-parallel synth+encode; map-only).
    */
  def audioBlobs(s: SparkSession, d: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(blobSchema)
    Tables
      .documents(s, d)
      .select($"doc_id")
      // r15: same spread as Multimodal.imageBlobs — the WAV synth loop
      // ran on the single-row-group scan's one task (see that note)
      .spreadAcrossCores()
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(id, AudioSynth.blobFor(id))
        }
      }(enc)
  }

  val decodedSchema: StructType = StructType(
    Seq(
      StructField("doc_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("duration_ms", LongType),
      StructField("peak_abs", IntegerType),
      StructField("sum_abs", LongType),
      StructField("mean_abs_milli", LongType)
    )
  )

  private def absStats(xs: Array[Short]): (Int, Long) = {
    var peak = 0
    var sum  = 0L
    var i    = 0
    while (i < xs.length) {
      val a = math.abs(xs(i).toInt)
      if (a > peak) peak = a
      sum += a
      i += 1
    }
    (peak, sum)
  }

  /** REAL batch decode: the chunk-walking reader parses the actual WAV
    * bytes; every output column comes from the decoder. duration_ms and
    * mean_abs_milli are floor divisions of exact integers (all operands
    * non-negative, so Spark's truncating long division and DuckDB's //
    * agree).
    */
  /** Decode-or-skip for an untrusted blob column: None on null bytes or
    * a codec failure — the standard corrupt-media semantic (chaos probe
    * r11) — and ONLY on those (the Try is scoped to the codec call, so a
    * post-decode kernel bug still fails loudly instead of masquerading
    * as an undecodable row; r11 review). Shared by the three decode
    * kernels and the corrupt-blob spec.
    */
  private[mm] def tryDecode(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] =
    if (bytes == null) None
    else scala.util.Try(WavCodec.decode(bytes)).toOption

  /** The decode kernel over any (doc_id, blob) frame — factored from the
    * driver query so the corrupt-blob spec can feed it adversarial bytes
    * (the generated corpus is always decodable, so the skip paths were
    * otherwise untestable; r11 review).
    */
  private[mm] def decodeTable(blobs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    blobs
      .mapPartitions { rows =>
        // undecodable blobs are skipped, not crashed on; fixture blobs
        // decode 100%, so the oracle row set is unchanged. Decodable but
        // EMPTY clips (zero samples) are skipped EXPLICITLY — duration
        // and mean stats are undefined on them
        rows.flatMap { r =>
          val id = r.getLong(0)
          tryDecode(r.getAs[Array[Byte]](1)).filter(_._3.nonEmpty).map {
            case (sr, ch, xs) =>
              val frames      = xs.length / ch
              val (peak, sum) = absStats(xs)
              Row(
                id, sr, ch, frames,
                frames.toLong * 1000L / sr,
                peak, sum,
                sum * 1000L / xs.length
              )
          }
        }
      }(enc)
      .orderBy($"doc_id")
  }

  val mmAudioDecode: Q = (s, d) => decodeTable(audioBlobs(s, d))

  /** Frame decimation factor for the resample query: keep every 4th
    * frame (all channels of it) — the integer-exact stand-in for "16 kHz
    * → 4 kHz" that a real pipeline's polyphase filter would do, chosen
    * so the oracle stays pure integer arithmetic.
    */
  val decimation = 4

  val resampledSchema: StructType = StructType(
    Seq(
      StructField("doc_id", LongType),
      StructField("orig_frames", IntegerType),
      StructField("out_rate", IntegerType),
      StructField("out_frames", IntegerType),
      StructField("out_peak_abs", IntegerType),
      StructField("out_sum_abs", LongType)
    )
  )

  /** REAL resample: decode, keep every [[decimation]]-th frame, RE-ENCODE
    * to WAV at the decimated rate, decode the re-encoded bytes again and
    * report stats from that second decode — the whole
    * decode→decimate→encode→decode chain must be lossless for the
    * arithmetic oracle to match (same discipline as mm_resize).
    */
  /** Resample kernel over any (doc_id, blob) frame — factored like
    * [[decodeTable]] for the corrupt-blob spec.
    */
  private[mm] def resampleTable(blobs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(resampledSchema)
    blobs
      .mapPartitions { rows =>
        // same skip-on-undecodable contract as mmAudioDecode; clips with
        // no samples, or a rate below the decimation factor (the output
        // rate would be 0), are EXPLICITLY undefined for resampling
        rows.flatMap { r =>
          val id = r.getLong(0)
          tryDecode(r.getAs[Array[Byte]](1))
            .filter { case (sr, _, xs) => xs.nonEmpty && sr >= decimation }
            .map { case (sr, ch, xs) =>
              val frames = xs.length / ch
              val kept = Array.range(0, frames, decimation).flatMap { f =>
                (0 until ch).map(c => xs(f * ch + c))
              }
              val rebytes       = WavCodec.encode(sr / decimation, ch, kept)
              val (sr2, c2, ys) = WavCodec.decode(rebytes)
              val (peak, sum)   = absStats(ys)
              Row(id, frames, sr2, ys.length / c2, peak, sum)
            }
        }
      }(enc)
      .orderBy($"doc_id")
  }

  val mmAudioResample: Q = (s, d) => resampleTable(audioBlobs(s, d))

  /** VAD synth + tunables (interpolated into the oracle): mono clips of
    * 1024..2816 samples in 64-sample frames; 4-frame blocks alternate
    * ACTIVE (full-range ±32768 pseudo-noise) and SILENT (±128 noise
    * floor) by `(id + block) % 3` — a planted 2/3 speech duty cycle. A
    * silent frame's |x| sum is ≤ 64·128 = 8 192 while an active frame's
    * is ≈ 1M, so the 100 000 threshold splits them with a ~12× margin
    * on both sides.
    */
  val vadFrameLen   = 64
  val vadThreshold  = 100000L
  def vadNSamples(id: Long): Int = (1024 + (id % 8) * 256).toInt
  def vadActiveBlock(id: Long, frame: Int): Boolean = (id + frame / 4) % 3 != 0
  def vadSample(id: Long, j: Int): Int = {
    val f = j / vadFrameLen
    // active branch IS AudioSynth.sample (r11 review: a verbatim inline
    // copy of the constants could silently drift from the synth the
    // decode oracles replay)
    if (vadActiveBlock(id, f)) AudioSynth.sample(id, j)
    else (((id * 7919 + j.toLong * 104729) % 257) - 128).toInt
  }

  private val vadSchema = StructType(
    Seq(
      StructField("doc_id", LongType),
      StructField("segment_id", IntegerType),
      StructField("is_active", IntegerType),
      StructField("start_frame", IntegerType),
      StructField("n_frames", LongType),
      StructField("sum_abs", LongType)
    )
  )

  /** Energy-based voice-activity detection over REAL decoded audio — the
    * segmentation step of a speech-data pipeline (strip silence before
    * transcription/training): synth → RIFF/WAVE encode → DECODE through
    * the chunk-walking reader, frame into 64-sample windows, threshold
    * each frame's integer |x| sum, and collapse consecutive same-state
    * frames into segments (the gaps-and-islands fold, run sequentially
    * inside the per-doc loop — frames per doc are bounded, docs are the
    * parallel unit). Everything is integer, and the oracle re-derives
    * every frame energy from the doc_id arithmetic codec-free, so a
    * wrong decode anywhere breaks the hash.
    */
  val mmAudioVad: Q = (s, d) => {
    val enc = org.apache.spark.sql.Encoders.row(vadSchema)
    Tables
      .documents(s, d)
      .select($"doc_id")
      // r15: same spread as audioBlobs — synth+codec loop on one task
      .spreadAcrossCores()
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val n  = vadNSamples(id)
          val xs = Array.tabulate(n)(j => vadSample(id, j).toShort)
          val (_, _, decoded) = WavCodec.decode(WavCodec.encode(16000, 1, xs, withListChunk = false))
          val nF = decoded.length / vadFrameLen
          val energies = Array.tabulate(nF) { f =>
            var sum = 0L
            var i   = 0
            while (i < vadFrameLen) { sum += math.abs(decoded(f * vadFrameLen + i).toInt); i += 1 }
            sum
          }
          val out   = Array.newBuilder[Row]
          var seg   = 0
          var segStart = 0
          var segSum   = 0L
          var prev: Option[Boolean] = None
          var f = 0
          while (f < nF) {
            val act = energies(f) > vadThreshold
            if (prev.contains(act)) segSum += energies(f)
            else {
              prev.foreach { p =>
                out += Row(id, seg, if (p) 1 else 0, segStart, (f - segStart).toLong, segSum)
              }
              seg = if (prev.isEmpty) 1 else seg + 1
              segStart = f
              segSum = energies(f)
              prev = Some(act)
            }
            f += 1
          }
          prev.foreach { p =>
            out += Row(id, seg, if (p) 1 else 0, segStart, (nF - segStart).toLong, segSum)
          }
          out.result().iterator
        }
      }(enc)
      .orderBy($"doc_id", $"segment_id")
  }

  // ------------------------------------------------------------ Goertzel

  /** Goertzel single-bin DFT energies over the first 256 channel-0
    * frames — the classic O(N) per-bin spectral probe (tone detection /
    * feature extraction) that avoids a full FFT when only a few bins
    * matter. Determinism design: the only transcendental, the bin
    * coefficient 2cos(2πk/N), is computed ONCE in Scala and shipped to
    * both engines as a 17-significant-digit literal — the recursion
    * itself is pure {+,×,−} on identical doubles, so the ~256-step state
    * chain is bit-identical cross-engine (a per-engine cos() call would
    * amplify a last-ULP coefficient difference through the whole
    * recursion); energies are floor-pinned to BIGINT (floor of identical
    * doubles never diverges — the binseg rule; a fixed-decimal round at
    * these ~10¹¹ magnitudes would sit inside double ULP). The oracle
    * replays the synth samples from doc_id arithmetic — codec-free, so a
    * wrong decode breaks the hash.
    */
  val goertzelN               = 256
  val goertzelBins: Seq[Int]  = Seq(1, 2, 4, 8, 16)
  val goertzelCoefs: Map[Int, Double] =
    goertzelBins.map(k => k -> 2.0 * math.cos(2.0 * math.Pi * k / goertzelN)).toMap
  private def coefLit(k: Int): String =
    "%.17g".formatLocal(java.util.Locale.ROOT, goertzelCoefs(k))

  val goertzelSchema: StructType = StructType(
    Seq(
      StructField("doc_id", LongType),
      StructField("bin", IntegerType),
      StructField("energy", LongType)
    )
  )

  /** Goertzel kernel over any (doc_id, blob) frame — factored like
    * [[decodeTable]] for the corrupt-blob spec.
    */
  private[mm] def goertzelTable(blobs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val enc  = org.apache.spark.sql.Encoders.row(goertzelSchema)
    val bins = goertzelBins
    val coefs = goertzelCoefs
    val n = goertzelN
    blobs
      .mapPartitions { rows =>
        rows.flatMap { r =>
          // skip-on-undecodable, as mmAudioDecode; clips shorter than
          // the n-sample analysis window are EXPLICITLY skipped (the
          // fixed-length Goertzel is undefined on them)
          val id = r.getLong(0)
          val decoded = tryDecode(r.getAs[Array[Byte]](1))
            .filter { case (_, ch, xs) => xs.length / ch >= n }
            .map { case (_, ch, xs) => Array.tabulate(n)(f => xs(f * ch).toDouble) }
          decoded.toSeq.flatMap { x => bins.map { k =>
            val c  = coefs(k)
            var s1 = 0.0; var s2 = 0.0; var j = 0
            while (j < n) { val s0 = x(j) + c * s1 - s2; s2 = s1; s1 = s0; j += 1 }
            val power = s1 * s1 + s2 * s2 - c * s1 * s2
            Row(id, k, math.floor(power).toLong)
          } }
        }
      }(enc)
      .orderBy($"doc_id", $"bin")
  }

  val mmAudioGoertzel: Q = (s, d) => goertzelTable(audioBlobs(s, d))

  val queries: Map[String, Q] = Map(
    "mm_audio_decode"   -> mmAudioDecode,
    "mm_audio_resample" -> mmAudioResample,
    "mm_audio_vad"      -> mmAudioVad,
    "mm_audio_goertzel" -> mmAudioGoertzel
  )

  /** Codec-free replays: the same `doc_id` integer arithmetic the synth
    * uses, over a generated interleaved-sample index. `(x % 65536) -
    * 32768` is the synth's sample; all stats fold in BIGINT.
    */
  val oracles: Map[String, String] = Map(
    // codec-free Goertzel replay: synth samples from doc_id arithmetic,
    // the same shared-literal coefficients, the identical {+,×,−}
    // recursion as a LIST-state fold ([s1, s2] — DuckDB 1.0 struct-state
    // lambdas leak the updated first field into the second's
    // evaluation; list elements evaluate independently), floor-pinned
    // energies
    "mm_audio_goertzel" -> {
      val binRows = goertzelBins
        .map(k => s"($k, CAST('${coefLit(k)}' AS DOUBLE))")
        .mkString(", ")
      s"""WITH p AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS BIGINT) AS ch
        |  FROM documents),
        |x AS (
        |  SELECT doc_id,
        |    [ CAST(((doc_id * 7919 + (f * ch) * 104729) % 65536) - 32768 AS DOUBLE)
        |      for f in range(0, $goertzelN) ] AS xs
        |  FROM p),
        |bins AS (SELECT * FROM (VALUES $binRows) b(k, c)),
        |g AS (
        |  SELECT doc_id, k, c,
        |    list_reduce(
        |      list_transform(xs, v -> [v, CAST(0.0 AS DOUBLE)]),
        |      (acc, e) -> [CAST(e[1] + c * acc[1] - acc[2] AS DOUBLE),
        |                   CAST(acc[1] AS DOUBLE)]) AS st
        |  FROM x CROSS JOIN bins)
        |SELECT doc_id, CAST(k AS INT) AS bin,
        |  CAST(floor(st[1] * st[1] + st[2] * st[2] - c * st[1] * st[2]) AS BIGINT) AS energy
        |FROM g ORDER BY doc_id, bin""".stripMargin
    },
    // codec-free VAD replay: frame energies from the branch formula,
    // threshold, gaps-and-islands segmentation — every tunable
    // interpolated from the engine's vals
    "mm_audio_vad" ->
      s"""WITH p AS (
        |  SELECT doc_id,
        |    CAST((1024 + (doc_id % 8) * 256) // $vadFrameLen AS INT) AS nf
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id, CAST(f AS INT) AS f
        |  FROM (SELECT doc_id, unnest(range(0, nf)) AS f FROM p) t),
        |fe AS (
        |  SELECT fr.doc_id, fr.f,
        |    CAST(SUM(CASE WHEN (fr.doc_id + (fr.f // 4)) % 3 <> 0
        |      THEN abs((fr.doc_id * 7919 + (fr.f * $vadFrameLen + i.range) * 104729)
        |        % 65536 - 32768)
        |      ELSE abs((fr.doc_id * 7919 + (fr.f * $vadFrameLen + i.range) * 104729)
        |        % 257 - 128) END) AS BIGINT) AS e
        |  FROM fr, range(0, $vadFrameLen) i
        |  GROUP BY fr.doc_id, fr.f),
        |va AS (SELECT doc_id, f, e, CAST(e > $vadThreshold AS INT) AS act FROM fe),
        |isl AS (
        |  SELECT *, CASE WHEN lag(act) OVER w IS NULL OR lag(act) OVER w <> act
        |    THEN 1 ELSE 0 END AS chg
        |  FROM va WINDOW w AS (PARTITION BY doc_id ORDER BY f)),
        |g AS (
        |  SELECT *, CAST(SUM(chg) OVER (PARTITION BY doc_id ORDER BY f
        |    ROWS UNBOUNDED PRECEDING) AS INT) AS seg
        |  FROM isl)
        |SELECT doc_id, seg AS segment_id, CAST(MAX(act) AS INT) AS is_active,
        |  CAST(MIN(f) AS INT) AS start_frame,
        |  CAST(COUNT(*) AS BIGINT) AS n_frames,
        |  CAST(SUM(e) AS BIGINT) AS sum_abs
        |FROM g GROUP BY doc_id, seg ORDER BY doc_id, segment_id""".stripMargin,
    "mm_audio_decode" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 8000 END AS INT) AS sample_rate,
        |    CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS INT) AS channels,
        |    CAST(256 + doc_id % 191 AS INT) AS n_frames
        |  FROM documents),
        |sm AS (
        |  SELECT doc_id,
        |    CAST(MAX(abs((doc_id * 7919 + j * 104729) % 65536 - 32768)) AS INT) AS peak_abs,
        |    CAST(SUM(abs((doc_id * 7919 + j * 104729) % 65536 - 32768)) AS BIGINT) AS sum_abs,
        |    COUNT(*) AS ns
        |  FROM (SELECT doc_id, unnest(range(0, n_frames * channels)) AS j FROM p) t
        |  GROUP BY doc_id)
        |SELECT p.doc_id, p.sample_rate, p.channels, p.n_frames,
        |  CAST(p.n_frames * 1000 // p.sample_rate AS BIGINT) AS duration_ms,
        |  sm.peak_abs, sm.sum_abs,
        |  CAST(sm.sum_abs * 1000 // sm.ns AS BIGINT) AS mean_abs_milli
        |FROM p JOIN sm USING (doc_id) ORDER BY p.doc_id""".stripMargin,
    "mm_audio_resample" ->
      s"""WITH p AS (
         |  SELECT doc_id,
         |    CAST(CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 8000 END AS INT) AS sample_rate,
         |    CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS INT) AS channels,
         |    CAST(256 + doc_id % 191 AS INT) AS n_frames
         |  FROM documents),
         |sm AS (
         |  SELECT doc_id,
         |    CAST(MAX(abs((doc_id * 7919 + j * 104729) % 65536 - 32768)) AS INT) AS out_peak_abs,
         |    CAST(SUM(abs((doc_id * 7919 + j * 104729) % 65536 - 32768)) AS BIGINT) AS out_sum_abs,
         |    COUNT(*) // MAX(channels) AS out_frames
         |  FROM (SELECT doc_id, channels, unnest(range(0, n_frames * channels)) AS j FROM p) t
         |  WHERE (j // channels) % $decimation = 0
         |  GROUP BY doc_id)
         |SELECT p.doc_id, p.n_frames AS orig_frames,
         |  CAST(p.sample_rate // $decimation AS INT) AS out_rate,
         |  CAST(sm.out_frames AS INT) AS out_frames,
         |  sm.out_peak_abs, sm.out_sum_abs
         |FROM p JOIN sm USING (doc_id) ORDER BY p.doc_id""".stripMargin
  )
}
