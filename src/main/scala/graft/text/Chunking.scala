package graft.text

import graft.syntax._
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data shaping operators — the steps between a cleaned corpus
  * and model-ready sequences (builder brief: "operations a large-scale
  * training-data pipeline would need"):
  *
  *  - '''chunking''' — sliding-window token chunks (stride < window ⇒
  *    overlap), the standard long-document split for a fixed context
  *    size. Pure built-ins (sequence/slice/posexplode), one codegen'd
  *    scan, map-only at any scale.
  *  - '''packing''' — greedy fill of documents into fixed token budgets
  *    (the "sequence packing" that keeps training batches dense). Greedy
  *    packing is inherently sequential, so it is SHARDED: docs hash into
  *    buckets, packing is sequential per bucket and parallel across
  *    buckets — exactly how a 1000-executor packing job runs (per-shard
  *    packers; the bucket count scales with the cluster, and per-bucket
  *    doc counts stay bounded because upstream sampling controls shard
  *    size). Oracle: a DuckDB recursive CTE replays each bucket's fold.
  *  - '''redaction''' — PII-style scrubbing (emails, long digit runs)
  *    via regexp_replace, with per-doc hit counts for audit. Map-only.
  */
object Chunking {
  type Q = (SparkSession, String) => DataFrame

  val chunkTokens = 40
  val chunkStride = 32 // 8-token overlap between consecutive chunks

  /** ONE sliding-window chunk expression (r11 review: textChunk and
    * pipeCurate carried verbatim copies; a stride/tail change missing one
    * would silently desync the two queries): windows of [[chunkTokens]]
    * tokens every [[chunkStride]], 1-based slice, empty tails filtered by
    * the callers.
    */
  private def chunkWindows(toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(
      sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(chunkStride)),
      start => slice(toks, start + 1, lit(chunkTokens))
    )

  val textChunk: Q = (s, d) => {
    val toks = split($"text", " ")
    Tables
      .documents(s, d)
      .select(
        $"doc_id",
        posexplode(chunkWindows(toks)).as(Seq("chunk_idx", "chunk"))
      )
      .filter(size($"chunk") > 0)
      .select(
        $"doc_id",
        $"chunk_idx",
        size($"chunk").as("n_tokens"),
        md5(array_join($"chunk", " ").cast("binary")).as("chunk_md5")
      )
      .orderBy($"doc_id", $"chunk_idx")
  }

  val packBudget  = 512
  val packBuckets = 8

  final case class PackedDoc(doc_id: Long, bucket: Long, pack_seq: Long, n_tokens: Int)

  /** Greedy packing, sequential per bucket: a doc opens a new pack when
    * adding it would exceed the budget (an oversize doc gets its own
    * pack). doc_id order within bucket keeps it deterministic.
    */
  val textPack: Q = (s, d) => {
    import s.implicits._
    Tables
      .documents(s, d)
      .select(
        col("doc_id"),
        (col("doc_id") % packBuckets).as("bucket"),
        // null text packs as a 0-token doc, not a NOT_NULL encoder
        // violation (chaos probe r11)
        coalesce(size(split(col("text"), " ")), lit(0)).as("nt")
      )
      .as[(Long, Long, Int)]
      .groupByKey(_._2)
      .flatMapGroups { (bucket, rows) =>
        val docs = rows.toArray.sortBy(_._1)
        var fill = 0
        var seq  = -1L
        docs.iterator.map { case (id, _, nt) =>
          if (seq < 0 || fill + nt > packBudget) { seq += 1; fill = nt }
          else fill += nt
          PackedDoc(id, bucket, seq, nt)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val numRe   = "[0-9]{4,}"

  val textRedact: Q = (s, d) =>
    Tables
      .documents(s, d)
      .select(
        $"doc_id",
        size(regexp_extract_all($"text", lit(emailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all($"text", lit(numRe), lit(0))).as("n_long_nums"),
        md5(
          regexp_replace(regexp_replace($"text", emailRe, "<EMAIL>"), numRe, "<NUM>")
            .cast("binary")
        ).as("redacted_md5"),
        length(regexp_replace(regexp_replace($"text", emailRe, "<EMAIL>"), numRe, "<NUM>"))
          .as("redacted_chars")
      )
      .orderBy($"doc_id")

  /** The composed curation pipeline — what a user actually runs end to
    * end: normalize → quality gate → exact dedup (keep min doc_id per
    * normalized hash) → chunk → per-doc chunk stats. Every stage is the
    * operator defined elsewhere in this library; the value of the query
    * is proving the COMPOSITION hash-exact (stages interact: dedup keys
    * on the *normalized* text, chunking runs on the normalized tokens).
    * One scan, two shuffles (dedup groupBy, final agg) — the chunk
    * explode stays map-side.
    */
  val pipeCurate: Q = (s, d) => {
    val norm = trim(regexp_replace(regexp_replace(lower($"text"), "[^a-z0-9 ]", " "), " +", " "))
    val docs = Tables
      .documents(s, d)
      .select($"doc_id", $"lang", norm.as("norm_text"))
      .withColumn("toks", split($"norm_text", " "))
      .withColumn("n_tokens", size($"toks"))
      .withColumn("ttr", size(array_distinct($"toks")) / size($"toks"))
      .filter($"n_tokens" >= 20 && $"ttr" >= 0.1)
    // keep = min doc_id per normalized hash, via a PARTITIONED window min:
    // one scan + one shuffle (a groupBy + self-join back would scan the
    // normalized corpus twice)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5($"norm_text".cast("binary")))
    val kept = docs
      .withColumn("keep_id", min($"doc_id").over(w))
      .filter($"doc_id" === $"keep_id")
    val chunks = kept.select(
      $"doc_id",
      $"lang",
      $"n_tokens",
      explode(chunkWindows($"toks")).as("chunk")
    )
    chunks
      .filter(size($"chunk") > 0)
      .groupBy($"doc_id", $"lang", $"n_tokens")
      .agg(
        count(lit(1)).cast("int").as("n_chunks"),
        sum(size($"chunk")).as("chunk_tokens")
      )
      .orderBy($"doc_id")
  }

  /** Train/eval decontamination — the benchmark-leakage scan run before
    * any training-data release: flag (train doc, eval doc) pairs sharing
    * any word 8-gram, with the shared-gram count as evidence weight.
    * Split assignment is the same deterministic md5 bucket rule as
    * text_split_assign.
    *
    * Scale shape: inverted-index join on the 8-gram with the shared
    * hot-bucket cap ([[graft.dedup.Dedup.capBuckets]] — boilerplate grams
    * shared by thousands of docs are excluded, same guard as LSH/winnow),
    * never all-pairs; at 100 TB the eval side is benchmark-sized, so the
    * join output is a sliver of the train gram stream. Grams are built by
    * a row-local UDF (the transform/sequence catalyst-lambda formulation
    * runs interpreted — 8-25× slower, round-1/2 precedent).
    */
  val pipeDecontaminate: Q = (s, d) => {
    val gramsUdf = udf { (text: String) =>
      // limit -1 keeps trailing empty tokens, matching the oracle's
      // string_split (and the repo's split(" ", -1) convention); null
      // text has no grams (chaos probe r11)
      val w = if (text == null) Array.empty[String] else text.split(" ", -1)
      if (w.length < 8) Array.empty[String]
      else Array.tabulate(w.length - 7)(i => w.slice(i, i + 8).mkString(" ")).distinct
    }
    val docs = Tables
      .documents(s, d)
      .withColumn("split", TextAnalysis.splitAssign($"text"))
    val grams = docs.select($"doc_id", $"split", explode(gramsUdf($"text")).as("gram"))
    val capped = graft.dedup.Dedup
      .capBuckets(grams, Seq("gram"), graft.dedup.Dedup.maxBucketSize)
    capped.as("t")
      .filter($"t.split" === "train")
      .join(
        capped.as("e").filter($"e.split" =!= "train"),
        $"t.gram" === $"e.gram"
      )
      .groupBy($"t.doc_id".as("train_doc"), $"e.doc_id".as("eval_doc"))
      .agg(count(lit(1)).as("shared_ngrams"))
      .orderBy($"train_doc", $"eval_doc")
  }

  /** Dataset release manifest — the datasheet a training-data release
    * ships: per (split, source) stratum, document/token/char counts,
    * the exact-dedup keep rate (what fraction survives the md5 keep
    * rule), and an ORDER-FREE content digest so two releases can be
    * compared without re-reading either corpus. The digest sums 48-bit
    * md5 prefixes in DECIMAL(38,0) — associative, so partition order
    * can't perturb it — and reduces mod 10¹⁸ at the very end (the mod
    * is what keeps the emitted value a BIGINT at any corpus size).
    * Splits reuse `text_split_assign`'s bucket rule and the keep rule
    * is `pipe_curate`'s window min — one scan, one grouped pass.
    */
  val pipeManifest: Q = (s, d) => {
    val byHash = org.apache.spark.sql.expressions.Window
      .partitionBy(md5($"text".cast("binary")))
    Tables
      .documents(s, d)
      .withColumn("split", TextAnalysis.splitAssign($"text"))
      .withColumn("n_tokens", size(split($"text", " ")).cast("long"))
      .withColumn("keep", ($"doc_id" === min($"doc_id").over(byHash)).cast("long"))
      .withColumn(
        "dg",
        conv(substring(md5($"text".cast("binary")), 1, 12), 16, 10).cast("decimal(38,0)")
      )
      .groupBy($"split", $"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("total_tokens"),
        sum($"n_chars").as("total_chars"),
        sum($"keep").as("kept_docs"),
        sum($"dg").as("sdg")
      )
      .select(
        $"split", $"source", $"n_docs", $"total_tokens", $"total_chars", $"kept_docs",
        round($"kept_docs" / $"n_docs", 6).as("keep_rate"),
        expr("CAST(sdg % CAST(1000000000000000000 AS DECIMAL(38,0)) AS BIGINT)")
          .as("content_digest")
      )
      .orderBy($"split", $"source")
  }

  val queries: Map[String, Q] = Map(
    "pipe_manifest"      -> pipeManifest,
    "text_chunk"        -> textChunk,
    "text_pack"         -> textPack,
    "text_redact"       -> textRedact,
    "pipe_curate"       -> pipeCurate,
    "pipe_decontaminate" -> pipeDecontaminate
  )

  val oracles: Map[String, String] = Map(
    // split bucket + window-min keep + the established hex-fold replay
    // of conv(substr(md5,1,12),16,10); digest summed in DECIMAL(38,0)
    // and reduced mod 1e18 exactly as the engine
    "pipe_manifest" ->
      """WITH docs AS (
        |  SELECT doc_id, source, n_chars, md5(text) AS h,
        |    CASE WHEN substr(md5(text), 1, 1) = 'e' THEN 'val'
        |         WHEN substr(md5(text), 1, 1) = 'f' THEN 'test'
        |         ELSE 'train' END AS split,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    list_reduce([instr('0123456789abcdef', md5(text)[i]) - 1
        |      for i in range(1, 13)], (a, b) -> a * 16 + b) AS dg
        |  FROM documents),
        |k AS (
        |  SELECT *, CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY h)
        |    THEN 1 ELSE 0 END AS keep
        |  FROM docs)
        |SELECT split, source,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(keep) AS BIGINT) AS kept_docs,
        |  round(CAST(SUM(keep) AS DOUBLE) / COUNT(*), 6) AS keep_rate,
        |  CAST(CAST(SUM(CAST(dg AS DECIMAL(38,0))) AS DECIMAL(38,0))
        |    % CAST(1000000000000000000 AS DECIMAL(38,0)) AS BIGINT) AS content_digest
        |FROM k GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "pipe_decontaminate" ->
      s"""WITH d AS (
         |  SELECT doc_id, text,
         |    CASE WHEN substring(md5(text), 1, 1) = 'e' THEN 'val'
         |         WHEN substring(md5(text), 1, 1) = 'f' THEN 'test'
         |         ELSE 'train' END AS split,
         |    string_split(text, ' ') AS w
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, split, unnest(list_distinct(
         |    CASE WHEN len(w) >= 8
         |      THEN [array_to_string(w[i : i + 7], ' ') for i in range(1, len(w) - 6)]
         |      ELSE CAST([] AS VARCHAR[]) END)) AS gram
         |  FROM d),
         |ok AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) <= ${graft.dedup.Dedup.maxBucketSize}),
         |gc AS (SELECT g.* FROM g JOIN ok USING (gram))
         |SELECT t.doc_id AS train_doc, e.doc_id AS eval_doc,
         |  CAST(COUNT(*) AS BIGINT) AS shared_ngrams
         |FROM gc t JOIN gc e ON t.gram = e.gram
         |  AND t.split = 'train' AND e.split <> 'train'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "text_chunk" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |starts AS (
         |  SELECT doc_id, toks,
         |    unnest(range(0, greatest(len(toks) - 1, 0) + 1, $chunkStride)) AS start
         |  FROM t),
         |chunks AS (
         |  SELECT doc_id,
         |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start) - 1 AS INT) AS chunk_idx,
         |    toks[start + 1 : start + $chunkTokens] AS chunk
         |  FROM starts)
         |SELECT doc_id, chunk_idx,
         |  CAST(len(chunk) AS INT) AS n_tokens,
         |  md5(array_to_string(chunk, ' ')) AS chunk_md5
         |FROM chunks WHERE len(chunk) > 0
         |ORDER BY doc_id, chunk_idx""".stripMargin,
    "text_pack" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, doc_id % $packBuckets AS bucket,
         |    COALESCE(CAST(len(string_split(text, ' ')) AS INT), 0) AS nt
         |  FROM documents),
         |ordered AS (
         |  SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn FROM d),
         |rec AS (
         |  SELECT bucket, rn, doc_id, nt, nt AS fill, CAST(0 AS BIGINT) AS pack_seq
         |  FROM ordered WHERE rn = 1
         |  UNION ALL
         |  SELECT o.bucket, o.rn, o.doc_id, o.nt,
         |    CASE WHEN r.fill + o.nt > $packBudget THEN o.nt ELSE r.fill + o.nt END,
         |    CASE WHEN r.fill + o.nt > $packBudget THEN r.pack_seq + 1 ELSE r.pack_seq END
         |  FROM rec r JOIN ordered o ON o.bucket = r.bucket AND o.rn = r.rn + 1)
         |SELECT doc_id, bucket, pack_seq, nt AS n_tokens
         |FROM rec ORDER BY doc_id""".stripMargin,
    "pipe_curate" ->
      s"""WITH norm AS (
         |  SELECT doc_id, lang,
         |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
         |  FROM documents),
         |toks AS (
         |  SELECT doc_id, lang, norm_text, string_split(norm_text, ' ') AS t,
         |    len(string_split(norm_text, ' ')) AS n_tokens
         |  FROM norm),
         |gated AS (
         |  SELECT * FROM toks
         |  WHERE n_tokens >= 20
         |    AND len(list_distinct(t)) / len(t) >= 0.1),
         |keep AS (
         |  SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY md5(norm_text)),
         |kept AS (
         |  SELECT g.* FROM gated g JOIN keep k ON g.doc_id = k.doc_id),
         |chunks AS (
         |  SELECT doc_id, lang, n_tokens,
         |    t[s + 1 : s + $chunkTokens] AS chunk
         |  FROM kept, LATERAL (SELECT unnest(range(0, greatest(n_tokens - 1, 0) + 1, $chunkStride)) AS s) r)
         |SELECT doc_id, lang, CAST(n_tokens AS INT) AS n_tokens,
         |  CAST(COUNT(*) AS INT) AS n_chunks,
         |  CAST(SUM(len(chunk)) AS BIGINT) AS chunk_tokens
         |FROM chunks WHERE len(chunk) > 0
         |GROUP BY doc_id, lang, n_tokens
         |ORDER BY doc_id""".stripMargin,
    "text_redact" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '[0-9]{4,}')) AS INT) AS n_long_nums,
        |  md5(regexp_replace(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'), '[0-9]{4,}', '<NUM>', 'g')) AS redacted_md5,
        |  CAST(length(regexp_replace(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'), '[0-9]{4,}', '<NUM>', 'g')) AS INT) AS redacted_chars
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
