package graft.queries

import graft.tables.Tables
import graft.syntax._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Entity matching, dominance analysis, and robust event analytics —
  * warehouse breadth beyond the reference's own query set (the reference
  * reconciles Square/Shopify names by exact key; a real multi-source
  * warehouse needs the fuzzy path, cf `/root/reference/bin/etl` key joins).
  *
  * Every query here is oracle-checked against DuckDB (SparkEntry wiring).
  */
object Matching {
  type Q = (SparkSession, String) => DataFrame

  /** Fuzzy entity matching over the part-name dictionary.
    *
    * Entity-resolution shape, not an all-pairs string join:
    *  1. '''dictionary first''' — dedupe to distinct names with a groupBy
    *     (the match runs over entities, not fact rows; at 100 TB the name
    *     dictionary is orders of magnitude smaller than the fact table and
    *     the per-name row count rides along as match evidence);
    *  2. '''blocking''' — candidate pairs only within a blocking key (last
    *     name token), turning O(n²) into O(Σ block²) — the standard ER
    *     trade: a typo in the blocking token itself is missed;
    *  3. '''cheap prefilters before the edit distance''' — length delta
    *     bound (|len(a)−len(b)| ≤ k implies nothing is lost at dist ≤ k),
    *     then the THRESHOLDED levenshtein (3-arg form, Spark 3.5+): the
    *     kernel early-abandons once a row of the DP matrix exceeds k and
    *     returns −1, so block pairs that are far apart cost O(k·len) not
    *     O(len²).
    * dist ∈ [1, k]: exact duplicates (dist 0) are the dedup family's job.
    */
  val jFuzzyMatch: Q = (s, d) => {
    val names = Tables
      .part(s, d)
      .groupBy($"p_name")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("blk", element_at(split($"p_name", " "), -1))
      // the dictionary is small by construction; checkpoint it so the
      // self-join reads it twice instead of re-running the fact scan +
      // rollup twice
      .localCheckpoint(true)
    val a = names.select($"p_name".as("name_a"), $"cnt".as("cnt_a"), $"blk")
    val b = names.select($"p_name".as("name_b"), $"cnt".as("cnt_b"), $"blk")
    a.join(b, "blk")
      .filter($"name_a" < $"name_b")
      .filter(abs(length($"name_a") - length($"name_b")) <= 2)
      .withColumn("dist", levenshtein($"name_a", $"name_b", 2))
      .filter($"dist" >= 1) // threshold form returns -1 beyond 2
      .select($"name_a", $"name_b", $"dist", $"cnt_a", $"cnt_b")
      .orderBy($"name_a", $"name_b")
  }

  /** Pareto skyline of parts (maximize p_retailprice, minimize p_size) —
    * the classic two-phase distributed skyline:
    *  1. '''map-side local prune''' (mapPartitions): each partition sorts
    *     its slice by (price desc, size asc) and sweeps once, emitting only
    *     its local frontier. Sound: a point dominated inside a partition is
    *     dominated globally, so nothing on the global frontier is lost and
    *     the data volume entering the next stage collapses from n to
    *     Σ per-partition frontier sizes (O(log n) expected per partition on
    *     independent dims).
    *  2. '''global verify''': the surviving candidates are tiny, so a
    *     broadcast nested-loop LEFT ANTI self-join applies the exact
    *     dominance predicate (≥/≤ with at least one strict). Duplicate
    *     (price, size) points do not dominate each other and all survive —
    *     matching the oracle's NOT EXISTS semantics.
    * At 100 TB phase 1 is embarrassingly parallel over the scan and phase 2
    * never sees more than candidates², with candidates ≪ n.
    */
  val aSkyline: Q = (s, d) => {
    // explicit encoder — `import s.implicits._` would shadow graft.syntax's $
    implicit val enc: org.apache.spark.sql.Encoder[(Long, Double, Int)] =
      org.apache.spark.sql.Encoders.product[(Long, Double, Int)]
    val pts = Tables
      .part(s, d)
      // dominance over a null dimension is undefined, and the tuple
      // encoder rejects nulls outright (chaos probe r11) — mirrored in
      // the oracle
      .filter($"p_partkey".isNotNull && $"p_retailprice".isNotNull && $"p_size".isNotNull)
      .select($"p_partkey", $"p_retailprice", $"p_size")
      .as[(Long, Double, Int)]
    val local = pts
      .mapPartitions { it =>
        val arr = it.toArray.sortBy { case (k, price, size) => (-price, size, k) }
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Int)]
        var i = 0
        var best = Int.MaxValue // min size over strictly-higher-priced groups
        while (i < arr.length) {
          var j = i
          val price = arr(i)._2
          while (j < arr.length && arr(j)._2 == price) j += 1
          val groupMin = arr(i)._3 // within-price sort is size asc
          if (groupMin < best) {
            var t = i
            while (t < j && arr(t)._3 == groupMin) { out += arr(t); t += 1 }
            best = groupMin
          }
          i = j
        }
        out.iterator
      }
      .toDF("p_partkey", "p_retailprice", "p_size")
      // candidates are tiny by construction; checkpoint so the verify
      // self-join reads them once instead of re-running the scan twice
      .localCheckpoint(true)
    val dominated = col("q.p_retailprice") >= col("c.p_retailprice") &&
      col("q.p_size") <= col("c.p_size") &&
      (col("q.p_retailprice") > col("c.p_retailprice") || col("q.p_size") < col("c.p_size"))
    local
      .alias("c")
      .join(local.alias("q"), dominated, "left_anti")
      .select($"p_partkey", $"p_retailprice", $"p_size")
      .orderBy($"p_partkey")
  }

  /** Cohort lifetime-value curves: customers grouped by first-order month,
    * revenue accumulated along cohort age. Two shuffles (per-customer
    * first-order min; cohort×age rollup) plus one partitioned window for
    * the running sum — DECIMAL partial sums end to end, so the cumulative
    * revenue is bit-exact and associative (safe under any partial-agg
    * order at scale).
    */
  val eCohortLtv: Q = (s, d) => {
    val o = Tables
      .orders(s, d)
      .select($"o_custkey", date_trunc("month", $"o_orderdate").as("m"), $"o_totalprice")
    val first = o.groupBy($"o_custkey").agg(min($"m").as("m0"))
    val cohort = o
      .join(first, "o_custkey")
      .groupBy(
        $"m0".cast("date").as("cohort_month"),
        (((year($"m") - year($"m0")) * 12) + (month($"m") - month($"m0"))).cast("int").as("age")
      )
      .agg(
        countDistinct($"o_custkey").as("active_customers"),
        sum($"o_totalprice".cast(DecimalType(18, 2))).as("revenue")
      )
    val w = Window
      .partitionBy($"cohort_month")
      .orderBy($"age")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cohort
      .withColumn("cum_revenue", sum($"revenue").over(w))
      // DECIMAL internally (exact, associative), DOUBLE at the output
      // boundary — house convention, keeps the driver compare on one type
      .select(
        $"cohort_month",
        $"age",
        $"active_customers",
        $"revenue".cast(DoubleType).as("revenue"),
        $"cum_revenue".cast(DoubleType).as("cum_revenue")
      )
      .orderBy($"cohort_month", $"age")
  }

  /** Robust (median/MAD) daily anomaly scores per event type — the
    * outlier-resistant sibling of [[Advanced.eAnomalies]]'s z-scores (one
    * extreme day inflates a stddev but barely moves a median). Daily
    * pre-aggregation shrinks the corpus to days×types BEFORE the exact
    * percentile stage, so the per-group sort the percentile needs is over
    * group-local day counts, not raw events. Daily sums ride DECIMAL
    * (order-independent); med/mad are rounded once and every downstream
    * number derives from the rounded values, keeping both engines' floats
    * aligned. A zero MAD (constant type) yields NULL score / flag 0 rather
    * than a cross-engine divide-by-zero divergence.
    */
  val eAnomaliesMad: Q = (s, d) => {
    val daily = Tables
      .events(s, d)
      .groupBy($"event_type", date_trunc("day", $"ts").cast("date").as("d"))
      .agg(sum($"value".cast(DecimalType(18, 6))).cast(DoubleType).as("v"))
    val med     = daily.groupBy($"event_type").agg(round(expr("percentile(v, 0.5)"), 6).as("med"))
    val withMed = daily.join(med, "event_type")
    val mads =
      withMed.groupBy($"event_type").agg(round(expr("percentile(abs(v - med), 0.5)"), 6).as("mad"))
    withMed
      .join(mads, "event_type")
      .withColumn("score", when($"mad" > 0, round(abs($"v" - $"med") / (lit(1.4826) * $"mad"), 6)))
      .withColumn("flag", (when($"mad" > 0, $"score" > 2.0).otherwise(lit(false))).cast("int"))
      .select($"event_type", $"d", $"v", $"med", $"mad", $"score", $"flag")
      .orderBy($"event_type", $"d")
  }

  /** Welch's two-sample t-test per event type over a deterministic 50/50
    * experiment split (event_id parity — the assignment rule an A/B
    * framework would persist). One aggregation pass computes both arms'
    * moments as conditional DECIMAL sums (exact under any partial-agg
    * order), then the t statistic and Welch–Satterthwaite df are closed
    * forms over the six moments — no per-row second pass, no shuffle
    * beyond the one groupBy. Degenerate (zero-variance) arms are filtered
    * on both engines rather than risking divide-by-zero divergence.
    */
  val eAbTest: Q = (s, d) => {
    // value.isNotNull (r11 review): COUNT(when(grp===0, 1)) counts EVERY
    // row while SUM skips nulls, so a null-valued event would bias the
    // means and variances identically on both engines — the oracle could
    // never catch it. Same filter abValueCounts already applies; no null
    // values exist in the current corpora, so results are unchanged.
    val ev = Tables.events(s, d)
      .filter($"value".isNotNull)
      .withColumn("grp", ($"event_id" % 2).cast("int"))
    val agg = ev
      .groupBy($"event_type")
      .agg(
        count(when($"grp" === 0, 1)).as("n_a"),
        count(when($"grp" === 1, 1)).as("n_b"),
        sum(when($"grp" === 0, $"value").cast(DecimalType(18, 6))).cast(DoubleType).as("sa"),
        sum(when($"grp" === 1, $"value").cast(DecimalType(18, 6))).cast(DoubleType).as("sb"),
        sum(when($"grp" === 0, $"value" * $"value").cast(DecimalType(24, 8)))
          .cast(DoubleType).as("sa2"),
        sum(when($"grp" === 1, $"value" * $"value").cast(DecimalType(24, 8)))
          .cast(DoubleType).as("sb2")
      )
    val calc = agg
      .withColumn("ma", $"sa" / $"n_a")
      .withColumn("mb", $"sb" / $"n_b")
      .withColumn("va", ($"sa2" - $"sa" * $"sa" / $"n_a") / ($"n_a" - 1))
      .withColumn("vb", ($"sb2" - $"sb" * $"sb" / $"n_b") / ($"n_b" - 1))
      .filter($"va" > 0 && $"vb" > 0)
      .withColumn("se2", $"va" / $"n_a" + $"vb" / $"n_b")
    calc
      .select(
        $"event_type",
        $"n_a",
        $"n_b",
        round($"ma", 6).as("mean_a"),
        round($"mb", 6).as("mean_b"),
        round(($"ma" - $"mb") / sqrt($"se2"), 6).as("t_stat"),
        round(
          ($"se2" * $"se2") /
            (($"va" / $"n_a") * ($"va" / $"n_a") / ($"n_a" - 1) +
              ($"vb" / $"n_b") * ($"vb" / $"n_b") / ($"n_b" - 1)),
          6
        ).as("welch_df")
      )
      .orderBy($"event_type")
  }

  /** Per-(event_type, value) group counts under the same A/B split as
    * `e_ab_test` — the shared input of both nonparametric tests below.
    */
  private def abValueCounts(s: SparkSession, d: String): DataFrame =
    Tables
      .events(s, d)
      // null values carry no rank/CDF information, and the engines sort
      // them to OPPOSITE ends of the cumulative window (Spark nulls
      // first, DuckDB nulls last) — excluded explicitly on both sides
      // (r6 self-review)
      .filter($"value".isNotNull)
      .withColumn("grp", ($"event_id" % 2).cast("int"))
      .groupBy($"event_type", $"value")
      .agg(
        sum(when($"grp" === 0, 1L).otherwise(0L)).as("ca"),
        sum(when($"grp" === 1, 1L).otherwise(0L)).as("cb")
      )

  /** Two-sample Kolmogorov–Smirnov test — the distribution-shape
    * complement of `e_ab_test`'s mean comparison (Welch detects a
    * shifted mean; KS detects ANY distributional change). The statistic
    * stays INTEGER until the last step: with per-value cumulative counts
    * Fa, Fb, the scaled gap |Fa·n_b − Fb·n_a| is exact long arithmetic,
    * its max is the D numerator, and only the final normalization and
    * the 1.358·√((n_a+n_b)/(n_a·n_b)) α=0.05 critical value touch
    * doubles (once-rounded; the reject flag compares the two rounded
    * values). One value-grain shuffle; cumulative windows ride the
    * event_type partition.
    */
  val eKsTest: Q = (s, d) => {
    val cum = Window.partitionBy($"event_type").orderBy($"value")
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.partitionBy($"event_type")
    abValueCounts(s, d)
      .withColumn("fa", sum($"ca").over(cum))
      .withColumn("fb", sum($"cb").over(cum))
      .withColumn("na", sum($"ca").over(tot))
      .withColumn("nb", sum($"cb").over(tot))
      .withColumn("dsc", abs($"fa" * $"nb" - $"fb" * $"na"))
      .groupBy($"event_type", $"na", $"nb")
      .agg(max($"dsc").as("d_scaled"))
      // a two-sample test needs both samples: one-sided groups are
      // untestable, not a divide-by-zero (chaos probe r11)
      .filter($"na" > 0 && $"nb" > 0)
      .select(
        $"event_type",
        $"na".as("n_a"),
        $"nb".as("n_b"),
        round($"d_scaled" / ($"na" * $"nb"), 6).as("d_stat"),
        round(lit(1.358) * sqrt(($"na" + $"nb") / ($"na" * $"nb").cast("double")), 6)
          .as("crit_05")
      )
      .withColumn("reject_05", ($"d_stat" > $"crit_05").cast("int"))
      .orderBy($"event_type")
  }

  /** Mann–Whitney U — the rank-based location test that doesn't assume
    * normality. Tie-bearing ranks are handled EXACTLY in integers: for a
    * value with c = ca+cb occurrences after `less` smaller observations,
    * the doubled average rank is 2·less + c + 1, so the doubled rank sum
    * 2R_A = Σ ca·(2·less + c + 1) and the doubled statistic
    * 2U_A = 2·n_a·n_b + n_a(n_a+1) − 2R_A are exact longs; only the
    * final normal approximation z = (2U_A − n_a·n_b) / (2·σ_U) divides
    * doubles (no tie-correction term — documented simplification, both
    * engines identical).
    */
  val eMannWhitney: Q = (s, d) => {
    val cum = Window.partitionBy($"event_type").orderBy($"value")
      .rowsBetween(Window.unboundedPreceding, 0)
    abValueCounts(s, d)
      .withColumn("cumall", sum($"ca" + $"cb").over(cum))
      .withColumn("less", $"cumall" - ($"ca" + $"cb"))
      .withColumn("r2a", $"ca" * (lit(2L) * $"less" + $"ca" + $"cb" + lit(1L)))
      .groupBy($"event_type")
      .agg(sum($"ca").as("na"), sum($"cb").as("nb"), sum($"r2a").as("sr2a"))
      // same two-sample requirement as e_ks_test (chaos probe r11)
      .filter($"na" > 0 && $"nb" > 0)
      .select(
        $"event_type",
        $"na".as("n_a"),
        $"nb".as("n_b"),
        (($"na" * $"nb" * 2 + $"na" * ($"na" + 1) - $"sr2a") / lit(2.0)).as("u_a"),
        round(
          (($"na" * $"nb" * 2 + $"na" * ($"na" + 1) - $"sr2a") - $"na" * $"nb") /
            (lit(2.0) * sqrt(($"na" * $"nb" * ($"na" + $"nb" + 1)) / lit(12.0))),
          6
        ).as("z_stat")
      )
      .orderBy($"event_type")
  }

  /** Kaplan–Meier survival curve of time-to-first-purchase — the
    * censoring-aware answer to "how long until a user converts" (a plain
    * average of observed conversion times is biased: users who never
    * converted are information, not missing data). Durations: days from
    * a user's first event to their first purchase (event) or last event
    * (right-censored). The estimator's risk set n_t = #(T ≥ t) is a
    * REVERSE cumulative sum over the day-grain duration table (bounded
    * by the calendar, the t_peak_concurrency precedent), and the product
    * Π(1 − d/n) is carried in LOG space with the established
    * transcendental discipline — each ln(1 − d/n) is one libm call on an
    * IEEE quotient of two BIGINTs, rounded once at 9 dp into
    * DECIMAL(20,9), so the cumulative sum is associative and the final
    * exp is a single per-row libm call on a deterministic double. A step
    * where every at-risk user events (d = n) pins survival at exactly 0
    * without touching ln(0) — both engines branch identically.
    */
  val eSurvivalKm: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val perUser = ev
      .groupBy($"user_id")
      .agg(
        min($"ts").as("first_ts"),
        max($"ts").as("last_ts"),
        min(when($"event_type" === "purchase", $"ts")).as("first_purchase")
      )
      .select(
        when($"first_purchase".isNotNull, datediff($"first_purchase", $"first_ts"))
          .otherwise(datediff($"last_ts", $"first_ts")).cast("long").as("t"),
        $"first_purchase".isNotNull.cast("long").as("event")
      )
    val byT = perUser
      .groupBy($"t")
      .agg(sum($"event").as("d"), count(lit(1)).as("c"))
    val riskW = Window.orderBy($"t").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val cumW  = Window.orderBy($"t").rowsBetween(Window.unboundedPreceding, 0)
    byT
      .withColumn("n_risk", sum($"c").over(riskW))
      .filter($"d" > 0)
      .withColumn(
        "lf",
        when($"d" < $"n_risk", round(log(lit(1.0) - $"d" / $"n_risk"), 9).cast(DecimalType(20, 9)))
      )
      .withColumn("cum_lf", sum($"lf").over(cumW))
      .select(
        $"t".as("t_days"),
        $"n_risk",
        $"d".as("n_events"),
        when($"d" === $"n_risk", 0.0)
          .otherwise(round(exp($"cum_lf".cast("double")), 6)).as("survival")
      )
      .orderBy($"t_days")
  }

  val queries: Map[String, Q] = Map(
    "e_survival_km"   -> eSurvivalKm,
    "j_fuzzy_match"   -> jFuzzyMatch,
    "a_skyline"       -> aSkyline,
    "e_cohort_ltv"    -> eCohortLtv,
    "e_anomalies_mad" -> eAnomaliesMad,
    "e_ab_test"       -> eAbTest,
    "e_ks_test"       -> eKsTest,
    "e_mann_whitney"  -> eMannWhitney
  )

  val oracles: Map[String, String] = Map(
    // duration table, reverse-cumulative risk set, once-rounded
    // ln(1-d/n) terms summed in DECIMAL, exp at the very end; the d=n
    // step pins survival 0 without evaluating ln(0)
    "e_survival_km" ->
      """WITH u AS (
        |  SELECT user_id,
        |    MIN(ts) AS first_ts, MAX(ts) AS last_ts,
        |    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
        |  FROM events GROUP BY user_id),
        |dur AS (
        |  SELECT
        |    CAST(CASE WHEN fp IS NOT NULL
        |      THEN date_diff('day', CAST(first_ts AS DATE), CAST(fp AS DATE))
        |      ELSE date_diff('day', CAST(first_ts AS DATE), CAST(last_ts AS DATE))
        |    END AS BIGINT) AS t,
        |    CAST(fp IS NOT NULL AS BIGINT) AS event
        |  FROM u),
        |byt AS (
        |  SELECT t, CAST(SUM(event) AS BIGINT) AS d, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM dur GROUP BY t),
        |rk AS (
        |  SELECT *, CAST(SUM(c) OVER (ORDER BY t
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
        |  FROM byt),
        |ev AS (
        |  SELECT *,
        |    CASE WHEN d < n_risk
        |      THEN CAST(round(ln(1.0 - CAST(d AS DOUBLE) / n_risk), 9) AS DECIMAL(20,9))
        |    END AS lf
        |  FROM rk WHERE d > 0),
        |cm AS (
        |  SELECT *, SUM(lf) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cum_lf
        |  FROM ev)
        |SELECT t AS t_days, n_risk, d AS n_events,
        |  CASE WHEN d = n_risk THEN 0.0
        |       ELSE round(exp(CAST(cum_lf AS DOUBLE)), 6) END AS survival
        |FROM cm ORDER BY t_days""".stripMargin,
    // integer-exact scaled gap max, one double normalization, rounded
    // critical value; flag compares the two rounded values
    "e_ks_test" ->
      """WITH c AS (
        |  SELECT event_type, value,
        |    CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |f AS (
        |  SELECT *,
        |    SUM(ca) OVER w AS fa, SUM(cb) OVER w AS fb,
        |    SUM(ca) OVER t AS na, SUM(cb) OVER t AS nb
        |  FROM c
        |  WINDOW w AS (PARTITION BY event_type ORDER BY value
        |    ROWS UNBOUNDED PRECEDING),
        |  t AS (PARTITION BY event_type)),
        |d AS (
        |  SELECT event_type, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
        |    CAST(MAX(abs(fa * nb - fb * na)) AS BIGINT) AS d_scaled
        |  FROM f GROUP BY event_type, na, nb),
        |o AS (
        |  SELECT event_type, na AS n_a, nb AS n_b,
        |    round(CAST(d_scaled AS DOUBLE) / (na * nb), 6) AS d_stat,
        |    round(1.358 * sqrt((na + nb) / CAST(na * nb AS DOUBLE)), 6) AS crit_05
        |  FROM d WHERE na > 0 AND nb > 0)
        |SELECT *, CAST(d_stat > crit_05 AS INT) AS reject_05
        |FROM o ORDER BY event_type""".stripMargin,
    // doubled tie-average ranks keep everything integer until the final
    // z normalization — same arithmetic order as the engine
    "e_mann_whitney" ->
      """WITH c AS (
        |  SELECT event_type, value,
        |    CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |r AS (
        |  SELECT *,
        |    SUM(ca + cb) OVER (PARTITION BY event_type ORDER BY value
        |      ROWS UNBOUNDED PRECEDING) - (ca + cb) AS less
        |  FROM c),
        |ag AS (
        |  SELECT event_type,
        |    CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
        |    CAST(SUM(ca * (2 * less + ca + cb + 1)) AS BIGINT) AS sr2a
        |  FROM r GROUP BY event_type)
        |SELECT event_type, na AS n_a, nb AS n_b,
        |  (na * nb * 2 + na * (na + 1) - sr2a) / 2.0 AS u_a,
        |  round(((na * nb * 2 + na * (na + 1) - sr2a) - na * nb)
        |    / (2.0 * sqrt((na * nb * (na + nb + 1)) / 12.0)), 6) AS z_stat
        |FROM ag WHERE na > 0 AND nb > 0 ORDER BY event_type""".stripMargin,
    "j_fuzzy_match" ->
      """WITH n AS (SELECT p_name, count(*) AS cnt FROM part GROUP BY p_name),
        |p AS (SELECT p_name, cnt, string_split(p_name, ' ')[-1] AS blk FROM n)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
        |  a.cnt AS cnt_a, b.cnt AS cnt_b
        |FROM p a JOIN p b ON a.blk = b.blk AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 2
        |ORDER BY name_a, name_b""".stripMargin,
    "a_skyline" ->
      """WITH pt AS (
        |  SELECT p_partkey, p_retailprice, p_size FROM part
        |  WHERE p_partkey IS NOT NULL AND p_retailprice IS NOT NULL
        |    AND p_size IS NOT NULL)
        |SELECT p_partkey, p_retailprice, p_size FROM pt p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pt q
        |  WHERE q.p_retailprice >= p.p_retailprice AND q.p_size <= p.p_size
        |    AND (q.p_retailprice > p.p_retailprice OR q.p_size < p.p_size))
        |ORDER BY p_partkey""".stripMargin,
    "e_cohort_ltv" ->
      """WITH o AS (
        |  SELECT o_custkey, date_trunc('month', o_orderdate) AS m, o_totalprice FROM orders),
        |f AS (SELECT o_custkey, min(m) AS m0 FROM o GROUP BY o_custkey),
        |c AS (
        |  SELECT CAST(f.m0 AS DATE) AS cohort_month,
        |    CAST((year(o.m) - year(f.m0)) * 12 + (month(o.m) - month(f.m0)) AS INT) AS age,
        |    count(DISTINCT o.o_custkey) AS active_customers,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
        |  FROM o JOIN f ON o.o_custkey = f.o_custkey
        |  GROUP BY 1, 2)
        |SELECT cohort_month, age, active_customers,
        |  CAST(revenue AS DOUBLE) AS revenue,
        |  CAST(SUM(revenue) OVER (PARTITION BY cohort_month ORDER BY age
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_revenue
        |FROM c ORDER BY cohort_month, age""".stripMargin,
    "e_ab_test" ->
      """WITH g AS (SELECT event_type, event_id % 2 AS grp, value FROM events
        |  WHERE value IS NOT NULL),
        |agg AS (
        |  SELECT event_type,
        |    COUNT(CASE WHEN grp = 0 THEN 1 END) AS n_a,
        |    COUNT(CASE WHEN grp = 1 THEN 1 END) AS n_b,
        |    CAST(SUM(CAST(CASE WHEN grp = 0 THEN value END AS DECIMAL(18,6))) AS DOUBLE) AS sa,
        |    CAST(SUM(CAST(CASE WHEN grp = 1 THEN value END AS DECIMAL(18,6))) AS DOUBLE) AS sb,
        |    CAST(SUM(CAST(CASE WHEN grp = 0 THEN value * value END AS DECIMAL(24,8))) AS DOUBLE) AS sa2,
        |    CAST(SUM(CAST(CASE WHEN grp = 1 THEN value * value END AS DECIMAL(24,8))) AS DOUBLE) AS sb2
        |  FROM g GROUP BY event_type),
        |calc AS (
        |  SELECT event_type, n_a, n_b,
        |    sa / n_a AS ma, sb / n_b AS mb,
        |    (sa2 - sa * sa / n_a) / (n_a - 1) AS va,
        |    (sb2 - sb * sb / n_b) / (n_b - 1) AS vb
        |  FROM agg)
        |SELECT event_type, n_a, n_b,
        |  round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
        |  round((ma - mb) / sqrt(va / n_a + vb / n_b), 6) AS t_stat,
        |  round(((va / n_a + vb / n_b) * (va / n_a + vb / n_b)) /
        |    ((va / n_a) * (va / n_a) / (n_a - 1)
        |      + (vb / n_b) * (vb / n_b) / (n_b - 1)), 6) AS welch_df
        |FROM calc WHERE va > 0 AND vb > 0 ORDER BY event_type""".stripMargin,
    "e_anomalies_mad" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, round(quantile_cont(v, 0.5), 6) AS med FROM daily GROUP BY 1),
        |m2 AS (
        |  SELECT d.event_type, round(quantile_cont(abs(d.v - st.med), 0.5), 6) AS mad
        |  FROM daily d JOIN st USING (event_type) GROUP BY 1)
        |SELECT d.event_type, d.d, d.v, st.med, m2.mad,
        |  CASE WHEN m2.mad > 0
        |    THEN round(abs(d.v - st.med) / (1.4826 * m2.mad), 6) END AS score,
        |  CAST(CASE WHEN m2.mad > 0
        |      AND round(abs(d.v - st.med) / (1.4826 * m2.mad), 6) > 2.0
        |    THEN 1 ELSE 0 END AS INT) AS flag
        |FROM daily d JOIN st USING (event_type) JOIN m2 USING (event_type)
        |ORDER BY d.event_type, d.d""".stripMargin
  )
}
