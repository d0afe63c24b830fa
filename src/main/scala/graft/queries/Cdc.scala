package graft.queries

import graft.syntax._
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture surface: MERGE-style upsert of a dimension
  * snapshot with a delta batch, and SCD Type-2 interval construction
  * from a change stream. The reference's warehouse refreshes dims by
  * full overwrite (`quickbooks_customers_ETL.py` rewrites the whole
  * table per run); these are the incremental forms that replace a full
  * rewrite once the dim stops fitting a single run's budget.
  *
  * Scale design: the upsert is one shuffle join on the merge key (the
  * delta side is the small CDC batch — broadcast-able when it fits;
  * Catalyst decides from stats), never a full-table sort. SCD2 is the
  * gaps-and-islands shape: ONE shuffle on the entity key, then two
  * window passes and a grouped aggregate riding the same partitioning —
  * Catalyst collapses the window/group chain onto a single exchange.
  */
object Cdc {
  type Q = (SparkSession, String) => DataFrame

  /** MERGE semantics (WHEN MATCHED THEN UPDATE, WHEN NOT MATCHED THEN
    * INSERT) without a table format that supports MERGE INTO: the delta
    * wins wholesale on key collision, unmatched base rows pass through.
    * Columns must align by name. One anti-join + union — a single
    * shuffle, no driver round-trip, rewrite-free until the sink.
    * The updates plan is consumed twice (probe keys + union payload);
    * a caller whose delta is expensive to compute should persist it —
    * not done here because a CDC batch is small by contract and this
    * combinator must not own cache lifecycle for its inputs.
    */
  def mergeUpsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    updates.unionByName(base.join(updates.select(keys.map(col): _*), keys, "left_anti"))

  /** Latest order per customer within a date predicate — the snapshot
    * shape on either side of the CDC cutoff. Tie-broken by orderkey so
    * same-day orders resolve identically in both engines.
    */
  private def lastOrderSnap(s: SparkSession, d: String, pred: org.apache.spark.sql.Column): DataFrame = {
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    Tables
      .orders(s, d)
      .filter(pred)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select(
        $"o_custkey".as("c_custkey"),
        $"o_orderkey".as("last_orderkey"),
        $"o_orderstatus".as("last_status"),
        $"o_totalprice".as("last_price"),
        $"o_orderdate".as("last_date")
      )
  }

  /** Upsert the pre-cutoff activity snapshot with the post-cutoff CDC
    * batch: customers active only before stay 'base', active after are
    * replaced ('delta'), first-active-after are inserted ('delta').
    *
    * r15 optimization (guide §2.4 remove shuffles outright): the merged
    * result is, per customer, the latest POST-cutoff order when one
    * exists (src 'delta' — the "delta wins wholesale" branch), else the
    * latest PRE-cutoff order (src 'base' — the anti-join pass-through).
    * That selection is ONE window over ONE orders scan ordered by
    * (is_delta DESC, date DESC, key DESC): the delta flag sorts the
    * post-cutoff rows first, so rn=1 is exactly the row
    * mergeUpsert(base, delta) kept. The previous shape paid two full
    * scans + two windows + an anti join + a persist/localCheckpoint of
    * the delta (needed only because the combinator consumed it twice);
    * 8.9 s → one exchange + the output sort. Same rows — the unchanged
    * oracle (an independent anti-join replay) pins the equivalence.
    */
  val wMergeUpsert: Q = (s, d) => {
    val cutoff = lit("2001-06-01").cast("date")
    val w = Window
      .partitionBy($"o_custkey")
      .orderBy($"is_delta".desc, $"o_orderdate".desc, $"o_orderkey".desc)
    Tables
      .orders(s, d)
      .withColumn("is_delta", ($"o_orderdate" >= cutoff).cast("int"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select(
        $"o_custkey".as("c_custkey"),
        $"o_orderkey".as("last_orderkey"),
        $"o_orderstatus".as("last_status"),
        $"o_totalprice".as("last_price"),
        $"o_orderdate".as("last_date"),
        when($"is_delta" === 1, "delta").otherwise("base").as("src")
      )
      .orderBy($"c_custkey")
  }

  /** SCD Type-2 from the event stream: per user, consecutive runs of the
    * same event_type collapse into a versioned validity interval
    * [valid_from, valid_to), open-ended for the current state. Classic
    * gaps-and-islands: change flag → running sum → island aggregate →
    * lead for the interval end.
    */
  val eScd2: Q = (s, d) => {
    val w    = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val runs = Window.partitionBy($"user_id").orderBy($"ts", $"event_id").rowsBetween(Window.unboundedPreceding, 0)
    val byVersion = Window.partitionBy($"user_id").orderBy($"version")
    Tables
      .events(s, d)
      .withColumn(
        "chg",
        when(lag($"event_type", 1).over(w).isNull || lag($"event_type", 1).over(w) =!= $"event_type", 1)
          .otherwise(0)
      )
      .withColumn("version", sum($"chg").over(runs))
      .groupBy($"user_id", $"version")
      .agg(
        max($"event_type").as("status"), // constant within an island
        min($"ts").as("valid_from"),
        count(lit(1)).as("n_events")
      )
      .withColumn("valid_to", lead($"valid_from", 1).over(byVersion))
      .withColumn("is_current", $"valid_to".isNull.cast("int"))
      .select($"user_id", $"version", $"status", $"valid_from", $"valid_to", $"n_events", $"is_current")
      .orderBy($"user_id", $"version")
  }

  /** Daily snapshot reconstruction from the SCD2 dimension — "time
    * travel" for warehouses that version rather than copy: for every
    * midnight in each user's active range, the status version valid at
    * that instant. The lookup is NOT a per-probe interval join: because
    * SCD2 intervals are contiguous (each valid_to is the next
    * valid_from), the as-of union trick applies — interval STARTS and
    * probes merge into one per-user stream ordered by (t, is_probe,
    * version), and `last(status ignoring nulls)` carries the governing
    * version forward. One shuffle on user_id total; ties where a version
    * begins exactly at midnight resolve to the new version on both
    * engines (interval rows sort before the probe; the oracle's
    * `valid_to > t` excludes the closed old version).
    */
  val eScd2Asof: Q = (s, d) => {
    // pinned (r11 review): iv feeds both the spine aggregate and the
    // starts branch — unpinned, the whole SCD2 window/aggregate chain
    // re-ran per branch (the wMergeUpsert precedent). localCheckpoint,
    // per the r10 CacheManager-race discipline; one row per interval.
    val iv = eScd2(s, d).select($"user_id", $"version", $"status", $"valid_from").localCheckpoint()
    val spine = iv
      .groupBy($"user_id")
      .agg(min($"valid_from").as("vf0"), max($"valid_from").as("vfn"))
      .select(
        $"user_id",
        // guarded: Spark's sequence() THROWS on start > stop while the
        // oracle's generate_series returns empty — a user whose versions
        // all begin on one calendar day must yield zero probes, not
        // abort the job (r6 self-review)
        explode(
          when(
            expr("date_add(cast(vf0 as date), 1) <= cast(vfn as date)"),
            expr("sequence(date_add(cast(vf0 as date), 1), cast(vfn as date), interval 1 day)")
          ).otherwise(array().cast("array<date>"))
        ).as("snapshot_date")
      )
    val probes = spine.select(
      $"user_id",
      $"snapshot_date",
      $"snapshot_date".cast("timestamp").as("t"),
      lit(1).as("is_probe"),
      lit(null).cast("string").as("status"),
      lit(null).cast("long").as("version")
    )
    val starts = iv.select(
      $"user_id",
      lit(null).cast("date").as("snapshot_date"),
      $"valid_from".as("t"),
      lit(0).as("is_probe"),
      $"status",
      $"version"
    )
    val carry = Window
      .partitionBy($"user_id")
      .orderBy($"t", $"is_probe", $"version")
      .rowsBetween(Window.unboundedPreceding, 0)
    probes
      .unionByName(starts)
      .withColumn("cur_status", last($"status", ignoreNulls = true).over(carry))
      .withColumn("cur_version", last($"version", ignoreNulls = true).over(carry))
      .filter($"is_probe" === 1 && $"cur_status".isNotNull)
      .select($"user_id", $"snapshot_date", $"cur_version".as("version"), $"cur_status".as("status"))
      .orderBy($"user_id", $"snapshot_date")
  }

  /** Snapshot reconciliation — the audit face of the same CDC cutoff:
    * classify every customer key as added (delta only), removed (base
    * only), changed, or unchanged between the two last-order snapshots.
    * One full-outer join on the key; the classification is pure row-local
    * CASE logic. This is how an incremental pipeline proves its merged
    * table against a fresh snapshot without rewriting either.
    */
  val wSnapshotDiff: Q = (s, d) => {
    val cutoff = lit("2001-06-01").cast("date")
    val base = lastOrderSnap(s, d, $"o_orderdate" < cutoff)
      .select($"c_custkey", $"last_orderkey".as("old_orderkey"), $"last_date".as("old_date"))
    val delta = lastOrderSnap(s, d, $"o_orderdate" >= cutoff)
      .select($"c_custkey", $"last_orderkey".as("new_orderkey"), $"last_date".as("new_date"))
    base
      .join(delta, Seq("c_custkey"), "full_outer")
      .select(
        $"c_custkey",
        when($"old_orderkey".isNull, "added")
          .when($"new_orderkey".isNull, "removed")
          .when($"old_orderkey" =!= $"new_orderkey", "changed")
          .otherwise("unchanged")
          .as("change_type"),
        $"old_orderkey",
        $"new_orderkey"
      )
      .orderBy($"c_custkey")
  }

  val queries: Map[String, Q] = Map(
    "w_merge_upsert"  -> wMergeUpsert,
    "w_snapshot_diff" -> wSnapshotDiff,
    "e_scd2"          -> eScd2,
    "e_scd2_asof"     -> eScd2Asof
  )

  val oracles: Map[String, String] = Map(
    "w_merge_upsert" ->
      """WITH base AS (
        |  SELECT * FROM (
        |    SELECT o_custkey AS c_custkey, o_orderkey AS last_orderkey,
        |      o_orderstatus AS last_status, o_totalprice AS last_price,
        |      o_orderdate AS last_date, 'base' AS src,
        |      row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |    FROM orders WHERE o_orderdate < DATE '2001-06-01')
        |  WHERE rn = 1),
        |delta AS (
        |  SELECT * FROM (
        |    SELECT o_custkey AS c_custkey, o_orderkey AS last_orderkey,
        |      o_orderstatus AS last_status, o_totalprice AS last_price,
        |      o_orderdate AS last_date, 'delta' AS src,
        |      row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |    FROM orders WHERE o_orderdate >= DATE '2001-06-01')
        |  WHERE rn = 1)
        |SELECT c_custkey, last_orderkey, last_status, last_price, last_date, src
        |FROM (
        |  SELECT * FROM delta
        |  UNION ALL
        |  SELECT b.* FROM base b ANTI JOIN delta d USING (c_custkey))
        |ORDER BY c_custkey""".stripMargin,
    "w_snapshot_diff" ->
      """WITH base AS (
        |  SELECT * FROM (
        |    SELECT o_custkey AS c_custkey, o_orderkey AS old_orderkey,
        |      row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |    FROM orders WHERE o_orderdate < DATE '2001-06-01')
        |  WHERE rn = 1),
        |delta AS (
        |  SELECT * FROM (
        |    SELECT o_custkey AS c_custkey, o_orderkey AS new_orderkey,
        |      row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |    FROM orders WHERE o_orderdate >= DATE '2001-06-01')
        |  WHERE rn = 1)
        |SELECT coalesce(b.c_custkey, d.c_custkey) AS c_custkey,
        |  CASE WHEN b.c_custkey IS NULL THEN 'added'
        |       WHEN d.c_custkey IS NULL THEN 'removed'
        |       WHEN b.old_orderkey <> d.new_orderkey THEN 'changed'
        |       ELSE 'unchanged' END AS change_type,
        |  b.old_orderkey, d.new_orderkey
        |FROM base b FULL OUTER JOIN delta d ON b.c_custkey = d.c_custkey
        |ORDER BY 1""".stripMargin,
    // CAST(ts AS TIMESTAMP) pins microsecond grain (the s_stream_sessions
    // precedent) — interval bounds and same-µs ordering must match the
    // engine's `ts div 1000` truncation on a ns-native DuckDB
    // SCD2 replay + per-user daily spine + the naive interval predicate
    // (valid_from <= t < valid_to) — the oracle may pay the per-probe
    // join the engine's as-of union avoids
    "e_scd2_asof" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w <> event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |islands AS (
        |  SELECT user_id, ts, event_type,
        |    CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
        |  FROM flagged),
        |grouped AS (
        |  SELECT user_id, version, MAX(event_type) AS status,
        |    MIN(ts) AS valid_from
        |  FROM islands GROUP BY user_id, version),
        |iv AS (
        |  SELECT user_id, version, status, valid_from,
        |    lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to
        |  FROM grouped),
        |spine AS (
        |  SELECT user_id,
        |    CAST(unnest(generate_series(CAST(MIN(valid_from) AS DATE) + 1,
        |      CAST(MAX(valid_from) AS DATE), INTERVAL 1 DAY)) AS DATE) AS snapshot_date
        |  FROM iv GROUP BY user_id)
        |SELECT s.user_id, s.snapshot_date, i.version, i.status
        |FROM spine s JOIN iv i
        |  ON i.user_id = s.user_id
        |  AND i.valid_from <= CAST(s.snapshot_date AS TIMESTAMP)
        |  AND (i.valid_to IS NULL OR i.valid_to > CAST(s.snapshot_date AS TIMESTAMP))
        |ORDER BY s.user_id, s.snapshot_date""".stripMargin,
    "e_scd2" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w <> event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |islands AS (
        |  SELECT user_id, ts, event_type,
        |    CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
        |  FROM flagged),
        |grouped AS (
        |  SELECT user_id, version, MAX(event_type) AS status,
        |    MIN(ts) AS valid_from, CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM islands GROUP BY user_id, version)
        |SELECT user_id, version, status, valid_from,
        |  lead(valid_from) OVER v AS valid_to, n_events,
        |  CAST(lead(valid_from) OVER v IS NULL AS INT) AS is_current
        |FROM grouped
        |WINDOW v AS (PARTITION BY user_id ORDER BY version)
        |ORDER BY user_id, version""".stripMargin
  )
}
