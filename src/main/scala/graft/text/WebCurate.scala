package graft.text

import graft.tables.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Web-corpus curation operators — the URL- and paragraph-level hygiene a
  * crawl-derived training corpus runs before any content-level dedup
  * (reference scope: none — this is part of the "operations a large-scale
  * training-data pipeline would need" brief, alongside
  * [[graft.text.Chunking]]'s decontamination/manifest ops):
  *
  *  - '''URL canonicalization''' — the standard crawl-dedup normal form:
  *    lowercase scheme+host, strip a leading `www.`, drop the scheme's
  *    default port, collapse duplicate path slashes, strip the trailing
  *    slash, drop `utm_*` tracking params and the fragment. Every rule is
  *    a codegen'd `regexp_replace`/`regexp_extract` chain — map-only, no
  *    UDF, no shuffle.
  *  - '''canonical-URL dedup''' — keep-first per canonical URL (min
  *    doc_id, the same window-min rule as `pipe_curate`'s content dedup),
  *    rolled up per host. One hash shuffle on the canonical URL; window
  *    partitions are duplicate-group-sized, never global.
  *  - '''paragraph dedup''' — CCNet-style: hash each paragraph, keep only
  *    its first occurrence corpus-wide (ordered by doc position), report
  *    per-doc survival. The fixture corpus is single-line, so "paragraph"
  *    is a fixed 8-token block — the Spark shape (posexplode → window min
  *    per paragraph hash → regroup) is exactly the one a real
  *    `split(text, '\n\n')` corpus runs.
  *
  * The fixture documents carry no URL column, so both engine and oracle
  * synthesize the same deterministic messy URL from (source, doc_id) —
  * the operator under test is the canonicalizer, not the generator.
  */
object WebCurate {
  type Q = (SparkSession, String) => DataFrame

  val paraTokens = 8

  /** Deterministic messy URL exercising every canonicalization rule:
    * upper-case scheme/host, default port on every 3rd doc, doubled path
    * slash, trailing slash on every 4th, two utm_* params around a real
    * one, fragment on every 2nd. The PAGE identity is `doc_id % 40` (not
    * doc_id), so distinct docs carry raw variants of the same page —
    * differing only in case/port/slash/fragment/utm — and the dedup facet
    * actually merges; with sources assigned mod 20, colliding docs always
    * share a host, so the collapse is visible in the per-host rollup.
    */
  private[text] def synthUrl(source: Column, docId: Column): Column = {
    val page = docId % 40
    concat(
      lit("HTTPS://WWW."), upper(source), lit(".Example.COM"),
      when(docId % 3 === 0, lit(":443")).otherwise(lit("")),
      lit("/Docs//"), page.cast("string"),
      when(docId % 4 === 0, lit("/")).otherwise(lit("")),
      lit("?utm_source=feed&id="), (page % 7).cast("string"), lit("&utm_campaign=x"),
      when(docId % 2 === 0, lit("#sec-2")).otherwise(lit(""))
    )
  }

  /** The canonical form. Rule order matters and is part of the contract:
    * fragment first (so later anchors see the true tail), then the
    * scheme://host head (case, www, default port), then path slashes,
    * then the query-param scrub. Pure built-in regexps — one codegen'd
    * projection.
    */
  private[text] def canonUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    val head   = regexp_extract(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    val tail   = noFrag.substr(length(head) + 1, lit(1 << 20))
    val head2 = regexp_replace(
      regexp_replace(
        // (www\.)+ not www\.: strip ALL leading www. repetitions in one
        // pass, or canon('://www.www.x') would keep shrinking per pass —
        // idempotence is the property the dedup keys rely on
        regexp_replace(lower(head), "://(www\\.)+", "://"),
        "^(https://.*):443$", "$1"
      ),
      "^(http://.*):80$", "$1"
    )
    val path  = regexp_extract(tail, "^[^?]*", 0)
    val query = tail.substr(length(path) + 1, lit(1 << 20))
    val path2 = regexp_replace(regexp_replace(path, "/{2,}", "/"), "/$", "")
    // ? → & so every param looks alike, strip &utm_*, promote the first
    // survivor back to ?; an all-utm query vanishes entirely
    val q2 = regexp_replace(regexp_replace(query, "\\?", "&"), "&utm_[^&]*", "")
    val q3 = regexp_replace(q2, "^&", "?")
    concat(head2, path2, q3)
  }

  private[text] def hostOf(canon: Column): Column =
    regexp_extract(canon, "^[a-z][a-z0-9+.-]*://([^/?#:]*)", 1)

  /** Per-doc canonical URL + host. Map-only: synth → canon → extract in
    * one codegen'd projection over the scan.
    */
  val textUrlCanon: Q = (s, d) => {
    import s.implicits._
    val docs  = Tables.documents(s, d)
    val canon = canonUrl(synthUrl($"source", $"doc_id"))
    docs
      .select(
        $"doc_id",
        canon.as("url_canon"),
        hostOf(canon).as("host")
      )
      .orderBy($"doc_id")
  }

  /** Host-level dedup report: raw URL count, distinct canonical URLs, and
    * keep-first survivors per host. One shuffle on the canonical URL
    * (window partitions = duplicate groups), one host rollup.
    */
  val dedupUrl: Q = (s, d) => {
    import s.implicits._
    val canon  = canonUrl(synthUrl($"source", $"doc_id"))
    val byUrl  = Window.partitionBy($"url_canon")
    Tables
      .documents(s, d)
      .select($"doc_id", canon.as("url_canon"))
      .withColumn("host", hostOf($"url_canon"))
      .withColumn("keep", ($"doc_id" === min($"doc_id").over(byUrl)).cast("long"))
      .groupBy($"host")
      .agg(
        count(lit(1)).as("n_urls"),
        countDistinct($"url_canon").as("n_canon"),
        sum($"keep").as("kept_docs")
      )
      .orderBy($"host")
  }

  /** CCNet-style paragraph dedup: fixed [[paraTokens]]-token blocks stand
    * in for `\n\n` paragraphs (single-line fixture corpus), first
    * occurrence corpus-wide wins (min (doc_id, idx) per paragraph hash —
    * deterministic, position-ordered), per-doc survival report. Scale
    * shape: posexplode is map-side; the only shuffle keys on the
    * paragraph hash; regroup keys on doc_id.
    */
  val dedupParagraph: Q = (s, d) => {
    import s.implicits._
    val toks   = split($"text", " ", -1)
    val nParas = ceil(size(toks) / lit(paraTokens.toDouble)).cast("int")
    val paras = transform(
      sequence(lit(0), nParas - 1),
      i => array_join(slice(toks, i * paraTokens + 1, lit(paraTokens)), " ")
    )
    val byPara = Window.partitionBy(md5($"para".cast("binary")))
    Tables
      .documents(s, d)
      .filter(size(toks) > 0)
      .select($"doc_id", posexplode(paras).as(Seq("idx", "para")))
      .withColumn(
        "keep",
        (struct($"doc_id", $"idx") === min(struct($"doc_id", $"idx")).over(byPara)).cast("long")
      )
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_paras"),
        sum($"keep").as("kept_paras"),
        sum(
          when($"keep" === 1, size(split($"para", " ", -1)).cast("long")).otherwise(lit(0L))
        ).as("kept_tokens")
      )
      .orderBy($"doc_id")
  }

  val queries: Map[String, Q] = Map(
    "text_url_canon"  -> textUrlCanon,
    "dedup_url"       -> dedupUrl,
    "dedup_paragraph" -> dedupParagraph
  )

  /** DuckDB replays. The synth + canon chain is re-derived in DuckDB's
    * regexp dialect (RE2; `regexp_replace` needs the explicit 'g' flag
    * where Spark's is always-global, backrefs are `\1` not `$1`).
    */
  private val synthCanonSql: String =
    """
      #  SELECT doc_id,
      #    'HTTPS://WWW.' || upper(source) || '.Example.COM'
      #      || CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END
      #      || '/Docs//' || CAST(doc_id % 40 AS VARCHAR)
      #      || CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END
      #      || '?utm_source=feed&id=' || CAST((doc_id % 40) % 7 AS VARCHAR) || '&utm_campaign=x'
      #      || CASE WHEN doc_id % 2 = 0 THEN '#sec-2' ELSE '' END AS url_raw
      #  FROM documents),
      #hd AS (
      #  SELECT doc_id, regexp_replace(url_raw, '#.*', '', 'g') AS nofrag,
      #    regexp_extract(regexp_replace(url_raw, '#.*', '', 'g'),
      #      '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*') AS head
      #  FROM raw),
      #pieces AS (
      #  SELECT doc_id,
      #    regexp_replace(regexp_replace(regexp_replace(lower(head),
      #      '://(www\.)+', '://'), '^(https://.*):443$', '\1'),
      #      '^(http://.*):80$', '\1') AS head2,
      #    regexp_extract(substr(nofrag, length(head) + 1), '^[^?]*') AS path,
      #    substr(substr(nofrag, length(head) + 1),
      #      length(regexp_extract(substr(nofrag, length(head) + 1), '^[^?]*')) + 1) AS query
      #  FROM hd),
      #canon AS (
      #  SELECT doc_id,
      #    head2
      #      || regexp_replace(regexp_replace(path, '/{2,}', '/', 'g'), '/$', '')
      #      || regexp_replace(
      #           regexp_replace(regexp_replace(query, '\?', '&', 'g'),
      #             '&utm_[^&]*', '', 'g'),
      #           '^&', '?') AS url_canon
      #  FROM pieces)
      #""".stripMargin('#')

  val oracles: Map[String, String] = Map(
    "text_url_canon" ->
      s"""WITH raw AS ($synthCanonSql
         #SELECT doc_id, url_canon,
         #  regexp_extract(url_canon, '^[a-z][a-z0-9+.-]*://([^/?#:]*)', 1) AS host
         #FROM canon ORDER BY doc_id""".stripMargin('#'),
    "dedup_url" ->
      s"""WITH raw AS ($synthCanonSql,
         #k AS (
         #  SELECT *, regexp_extract(url_canon, '^[a-z][a-z0-9+.-]*://([^/?#:]*)', 1) AS host,
         #    CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY url_canon)
         #      THEN 1 ELSE 0 END AS keep
         #  FROM canon)
         #SELECT host, CAST(COUNT(*) AS BIGINT) AS n_urls,
         #  CAST(COUNT(DISTINCT url_canon) AS BIGINT) AS n_canon,
         #  CAST(SUM(keep) AS BIGINT) AS kept_docs
         #FROM k GROUP BY 1 ORDER BY 1""".stripMargin('#'),
    "dedup_paragraph" ->
      s"""WITH t AS (
         #  SELECT doc_id, string_split(text, ' ') AS w FROM documents
         #  WHERE len(string_split(text, ' ')) > 0),
         #p AS (
         #  SELECT doc_id, w,
         #    unnest(range(0, CAST(ceil(len(w) / $paraTokens.0) AS BIGINT))) AS idx
         #  FROM t),
         #p2 AS (
         #  SELECT doc_id, CAST(idx AS INT) AS idx,
         #    array_to_string(w[idx * $paraTokens + 1 : idx * $paraTokens + $paraTokens], ' ') AS para
         #  FROM p),
         #k AS (
         #  SELECT doc_id, idx, para,
         #    row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, idx) AS rn
         #  FROM p2)
         #SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_paras,
         #  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_paras,
         #  CAST(SUM(CASE WHEN rn = 1 THEN len(string_split(para, ' ')) ELSE 0 END) AS BIGINT)
         #    AS kept_tokens
         #FROM k GROUP BY 1 ORDER BY 1""".stripMargin('#')
  )
}
