package graft.queries

import graft.syntax._
import graft.tables.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row (key, t), attach the latest right row
  * with the same key and rightTime ≤ t (left-outer: no match → nulls).
  * The time-series operator Spark's join zoo doesn't ship (DuckDB: `ASOF
  * JOIN`, which is exactly the oracle used for `j_asof`).
  *
  * Spark-first shape: tag both sides, UNION, one running
  * `last(payload, ignoreNulls)` window ordered by (t, side, tiebreak).
  * That is ONE hash shuffle on the key and a running frame —
  *  - no range-condition join (Catalyst would nested-loop it),
  *  - no per-key collect/sort buffer beyond the window's spillable sort,
  *  - no right-side pre-aggregation shuffle: ties on rightTime resolve
  *    INSIDE the same sort via the tiebreak column (last wins ⇒ max
  *    tiebreak), so dedup rides the window's own exchange.
  * At 100 TB both sides shuffle once on the join key — the same cost as
  * the equi-join the as-of degenerates to when times are unique; skew
  * follows the key distribution, AQE splits oversized partitions.
  *
  * Ordering semantics: right rows sort BEFORE left rows at equal time
  * (side 0 < 1), so a right row at exactly t IS visible to that left row
  * ("at-or-before", matching `ASOF JOIN ... ON l.t >= r.t`).
  */
object AsofJoin {

  /** @param payload right-side columns to carry; `payload.head` is also
    *                the tiebreak among right rows sharing (key, time) —
    *                pass a unique non-null id first so ties resolve to the
    *                max-id row deterministically (equivalent to pre-reducing
    *                the right side to argmax(payload.head) per (key, time),
    *                but resolved inside the window's own sort — no extra
    *                shuffle).
    *
    * Null semantics match `ASOF JOIN ... ON l.key = r.key AND l.t >= r.t`:
    * a NULL never satisfies either conjunct, so right rows with NULL
    * key/time are dropped up front, and left rows with NULL key/time fall
    * through with a null match — a null-key left partition contains no
    * right rows, and a null-time left row sorts before every right row of
    * its key (asc = nulls first), so its running `last` is empty.
    */
  /** @param forward false = "at-or-before" (latest rightTime ≤ t, the
    *                default ASOF direction); true = "at-or-after"
    *                (EARLIEST rightTime ≥ t — lead-time joins: next
    *                shipment, next price change). Same single-shuffle
    *                union+window shape, scanned in reverse time order;
    *                nulls-first keeps null-time left rows matchless in
    *                both directions.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      forward: Boolean = false
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(payload.map(col): _*)
    val r = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .select(
        col(key).as("__k"),
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        payloadStruct.as("__p")
      )
    val l = left.select(
      (leftCols.map(col) :+
        col(key).as("__k") :+
        col(leftTime).as("__t") :+
        lit(1).as("__side") :+
        lit(null).cast(r.schema("__p").dataType).as("__p")): _*
    )
    // one shuffle: partition by key; running last() needs no full-frame
    // buffer. __p sorts right rows at equal __t so "last" = max tiebreak.
    // Forward direction scans time DESC (nulls first, so a null-time left
    // row still precedes every right row and stays matchless); right rows
    // keep sorting before left rows at equal time, so "at-or-after"
    // includes the exact-t right row symmetrically to "at-or-before".
    val timeOrder = if (forward) $"__t".desc_nulls_first else $"__t".asc
    val w = Window
      .partitionBy($"__k")
      .orderBy(timeOrder, $"__side".asc, $"__p".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l
      .unionByName(r, allowMissingColumns = true)
      .withColumn("__m", last($"__p", ignoreNulls = true).over(w))
      .filter($"__side" === 1)
    matched.select(
      (leftCols.map(col) ++ payload.map(p => col(s"__m.$p").as(p))): _*
    )
  }

  /** Driver row: purchase attribution over the events stream — for every
    * non-purchase event, the same user's most recent purchase at-or-before
    * it. Oracle: DuckDB's native ASOF LEFT JOIN (an independent
    * implementation of the semantics, not a replay of ours). Tie semantics
    * among purchases sharing (user_id, ts) are unspecified in native ASOF,
    * so the oracle pre-reduces the right side to the max-purchase_id row
    * per (user_id, ts) — exactly what the engine's in-window tiebreak picks
    * (purchase_id is unique, so max payload struct = max purchase_id).
    */
  val jAsof: (SparkSession, String) => DataFrame = (s, d) => {
    val e = Tables.events(s, d)
    val purchases = e
      .filter($"event_type" === "purchase")
      .select(
        $"user_id",
        $"ts",
        $"event_id".as("purchase_id"),
        $"value".as("purchase_value")
      )
    val lefts = e
      .filter($"event_type" =!= "purchase")
      .select($"event_id", $"user_id", $"ts", $"event_type")
    asof(lefts, purchases, key = "user_id", leftTime = "ts", rightTime = "ts",
      payload = Seq("purchase_id", "purchase_value"))
      .orderBy($"event_id")
  }

  /** Forward driver row: for every non-purchase event, the same user's
    * EARLIEST purchase at-or-after it (lead-time attribution). Oracle:
    * DuckDB native `ASOF LEFT JOIN ... ON l.ts <= p.ts`, right side
    * pre-reduced per (user_id, ts) exactly as the backward row.
    */
  val jAsofForward: (SparkSession, String) => DataFrame = (s, d) => {
    val e = Tables.events(s, d)
    val purchases = e
      .filter($"event_type" === "purchase")
      .select(
        $"user_id",
        $"ts",
        $"event_id".as("purchase_id"),
        $"value".as("purchase_value")
      )
    val lefts = e
      .filter($"event_type" =!= "purchase")
      .select($"event_id", $"user_id", $"ts", $"event_type")
    asof(lefts, purchases, key = "user_id", leftTime = "ts", rightTime = "ts",
      payload = Seq("purchase_id", "purchase_value"), forward = true)
      .orderBy($"event_id")
  }

  /** Nearest-in-time join — the feature-engineering variant (attach the
    * closest sensor reading / price tick regardless of direction): run
    * the SAME single-shuffle union+window pass in both directions, then
    * pick whichever match is closer in integer microseconds; exact ties
    * resolve to the backward (at-or-before) match, the causal side. Two
    * passes of the proven shape beat a range join: each is one key
    * shuffle + a running window, with no interval blow-up to refine.
    */
  val jAsofNearest: (SparkSession, String) => DataFrame = (s, d) => {
    val e = Tables.events(s, d)
    val purchases = e
      .filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("pts"), $"event_id".as("purchase_id"))
    val lefts = e
      .filter($"event_type" =!= "purchase")
      .select($"event_id", $"user_id", $"ts", $"event_type")
    def side(forward: Boolean, idAs: String, tsAs: String) =
      asof(lefts, purchases, key = "user_id", leftTime = "ts", rightTime = "pts",
        payload = Seq("purchase_id", "pts"), forward = forward)
        .withColumnsRenamed(Map("purchase_id" -> idAs, "pts" -> tsAs))
    val back = side(forward = false, "b_id", "b_ts")
    val fwd  = side(forward = true, "f_id", "f_ts").select($"event_id", $"f_id", $"f_ts")
    val pickBack = $"f_ts".isNull ||
      ($"b_ts".isNotNull &&
        (unix_micros($"ts") - unix_micros($"b_ts")) <= (unix_micros($"f_ts") - unix_micros($"ts")))
    back
      .join(fwd, Seq("event_id"))
      .select(
        $"event_id", $"user_id", $"ts", $"event_type",
        when($"b_ts".isNull && $"f_ts".isNull, lit(null).cast("long"))
          .when(pickBack, $"b_id").otherwise($"f_id").as("purchase_id"),
        when($"b_ts".isNull && $"f_ts".isNull, lit(null).cast("timestamp"))
          .when(pickBack, $"b_ts").otherwise($"f_ts").as("purchase_ts"),
        when($"b_ts".isNull && $"f_ts".isNull, lit(null).cast("string"))
          .when(pickBack, lit("before")).otherwise(lit("after")).as("direction"),
        when($"b_ts".isNull && $"f_ts".isNull, lit(null).cast("long"))
          .when(pickBack, unix_micros($"ts") - unix_micros($"b_ts"))
          .otherwise(unix_micros($"f_ts") - unix_micros($"ts")).as("delta_us")
      )
      .orderBy($"event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("j_asof" -> jAsof, "j_asof_forward" -> jAsofForward,
      "j_asof_nearest" -> jAsofNearest)

  val oracles: Map[String, String] = Map(
    // both native ASOF directions, right side pre-reduced per (user, ts)
    // as in j_asof; the nearer match wins, microsecond distances, exact
    // tie -> the backward (causal) side
    "j_asof_nearest" ->
      """WITH p0 AS (
        |  SELECT user_id, ts, event_id AS purchase_id
        |  FROM events
        |  WHERE event_type = 'purchase' AND user_id IS NOT NULL AND ts IS NOT NULL),
        |p AS (
        |  SELECT user_id, ts, purchase_id FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY user_id, ts ORDER BY purchase_id DESC) AS rn
        |    FROM p0) WHERE rn = 1),
        |l AS (
        |  SELECT event_id, user_id, ts, event_type
        |  FROM events WHERE event_type <> 'purchase'),
        |b AS (
        |  SELECT l.event_id, p.purchase_id AS b_id, p.ts AS b_ts
        |  FROM l ASOF LEFT JOIN p ON l.user_id = p.user_id AND l.ts >= p.ts),
        |f AS (
        |  SELECT l.event_id, p.purchase_id AS f_id, p.ts AS f_ts
        |  FROM l ASOF LEFT JOIN p ON l.user_id = p.user_id AND l.ts <= p.ts)
        |SELECT l.event_id, l.user_id, l.ts, l.event_type,
        |  CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
        |       WHEN f_ts IS NULL OR (b_ts IS NOT NULL AND
        |         epoch_us(l.ts) - epoch_us(b_ts) <= epoch_us(f_ts) - epoch_us(l.ts))
        |       THEN b_id ELSE f_id END AS purchase_id,
        |  CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
        |       WHEN f_ts IS NULL OR (b_ts IS NOT NULL AND
        |         epoch_us(l.ts) - epoch_us(b_ts) <= epoch_us(f_ts) - epoch_us(l.ts))
        |       THEN b_ts ELSE f_ts END AS purchase_ts,
        |  CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
        |       WHEN f_ts IS NULL OR (b_ts IS NOT NULL AND
        |         epoch_us(l.ts) - epoch_us(b_ts) <= epoch_us(f_ts) - epoch_us(l.ts))
        |       THEN 'before' ELSE 'after' END AS direction,
        |  CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
        |       WHEN f_ts IS NULL OR (b_ts IS NOT NULL AND
        |         epoch_us(l.ts) - epoch_us(b_ts) <= epoch_us(f_ts) - epoch_us(l.ts))
        |       THEN epoch_us(l.ts) - epoch_us(b_ts)
        |       ELSE epoch_us(f_ts) - epoch_us(l.ts) END AS delta_us
        |FROM l JOIN b USING (event_id) JOIN f USING (event_id)
        |ORDER BY l.event_id""".stripMargin,
    "j_asof" ->
      """WITH p0 AS (
        |  SELECT user_id, ts, event_id AS purchase_id, value AS purchase_value
        |  FROM events
        |  WHERE event_type = 'purchase' AND user_id IS NOT NULL AND ts IS NOT NULL),
        |p AS (
        |  SELECT user_id, ts, purchase_id, purchase_value FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY user_id, ts ORDER BY purchase_id DESC) AS rn
        |    FROM p0) WHERE rn = 1),
        |l AS (
        |  SELECT event_id, user_id, ts, event_type
        |  FROM events WHERE event_type <> 'purchase')
        |SELECT l.event_id, l.user_id, l.ts, l.event_type, p.purchase_id, p.purchase_value
        |FROM l ASOF LEFT JOIN p ON l.user_id = p.user_id AND l.ts >= p.ts
        |ORDER BY l.event_id""".stripMargin,
    "j_asof_forward" ->
      """WITH p0 AS (
        |  SELECT user_id, ts, event_id AS purchase_id, value AS purchase_value
        |  FROM events
        |  WHERE event_type = 'purchase' AND user_id IS NOT NULL AND ts IS NOT NULL),
        |p AS (
        |  SELECT user_id, ts, purchase_id, purchase_value FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY user_id, ts ORDER BY purchase_id DESC) AS rn
        |    FROM p0) WHERE rn = 1),
        |l AS (
        |  SELECT event_id, user_id, ts, event_type
        |  FROM events WHERE event_type <> 'purchase')
        |SELECT l.event_id, l.user_id, l.ts, l.event_type, p.purchase_id, p.purchase_value
        |FROM l ASOF LEFT JOIN p ON l.user_id = p.user_id AND l.ts <= p.ts
        |ORDER BY l.event_id""".stripMargin
  )
}
