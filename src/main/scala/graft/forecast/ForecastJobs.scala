package graft.forecast

import graft.syntax._
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** M1 — the per-group model loop (`/root/reference/bin/modelling/
  * arima_models.py:193-213`, `holt_model.py:182-199`,
  * `simp_avg_model.py:182-199`) as `groupByKey.flatMapGroups`.
  *
  * Scale design: the input is a (profile, week, weight) weekly rollup —
  * tiny relative to the fact data even at 100 TB of transactions (cardinality
  * = profiles × weeks). The expensive part is the model grid (50 ARIMA
  * configs × walk-forward refits per profile), which parallelizes across
  * profiles: one shuffle on profile_name, then embarrassingly parallel
  * tasks. Series are sorted in-group by week — the positional-order
  * dependence the reference gets implicitly from its ORDER BY
  * (`arima_models.py:139,200`; SURVEY §2.8 O1).
  */
object ForecastJobs {

  final case class WeeklyRow(profile_name: String, week_date: java.sql.Date, weight: Double)
  final case class SesResult(profile_name: String, mse: Double, prediction: Double)
  final case class HoltResult(profile_name: String, mse: Double, prediction: Double)
  final case class ArimaResult(
      profile_name: String,
      best_config: String,
      mse: Double,
      prediction: Double,
      std_error: Double,
      lower_bound: Double,
      upper_bound: Double
  )

  /** The weekly-demand series over the oracle corpus: detail × dim joins →
    * weight per (profile, week). `p_brand` plays profile_name, quantity ×
    * a per-part weight plays (i.weight * quantity) (`arima_models.py:81`).
    * F6 (time filter) + W2 (min-history HAVING via count window) applied,
    * mirroring `arima_models.py:155-162`.
    */
  def weeklySeries(s: SparkSession, dir: String, minWeeks: Int): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val p  = Tables.part(s, dir)
    val weekly = li
      .join(broadcast(p), li("l_partkey") === p("p_partkey"), "inner")
      .filter($"l_shipdate" < lit("2001-06-01").cast("timestamp")) // F6
      .groupBy(
        $"p_brand".as("profile_name"),
        date_trunc("week", $"l_shipdate").cast("date").as("week_date")
      )
      .agg(
        sum(($"l_quantity" * $"p_retailprice" / lit(100.0))
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast(org.apache.spark.sql.types.DoubleType)
          .as("weight")
      )
    val w = Window.partitionBy($"profile_name")
    weekly
      .withColumn("n_weeks", count(lit(1)).over(w)) // W2
      .filter($"n_weeks" > minWeeks)
      .drop("n_weeks")
  }

  private def series(it: Iterator[WeeklyRow]): Array[Double] =
    it.toArray.sortBy(r => r.week_date.getTime).map(_.weight)

  /** SES driver (`simp_avg_model.py`): fixed α = 0.6, > 8 weeks history. */
  def sesJob(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    typedWeekly(s, dir, minWeeks = 8)
      .groupByKey(_.profile_name)
      .flatMapGroups { (profile, rows) =>
        val xs = series(rows)
        val (m, _) = Models.sesWalkForward(xs, alpha = 0.6)
        Iterator.single(SesResult(profile, m, Models.sesForecast(xs, 0.6)))
      }
      .toDF()
      .orderBy(col("profile_name"))
  }

  /** Holt driver (`holt_model.py`): optimized (α,β), > 10 weeks history.
    *
    * Walk-forward steps are DISTRIBUTED: step i's fit depends only on the
    * prefix xs[0, split+i), which is known upfront — so each (profile,
    * step) is an independent task (plus a sentinel step for the final
    * full-series forecast), reduced back to (mse, prediction) per
    * profile. Parallelism = profiles × test points instead of profiles.
    */
  def holtJob(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cores = s.sparkContext.defaultParallelism
    typedWeekly(s, dir, minWeeks = 10)
      .groupByKey(_.profile_name)
      .mapGroups((k, rows) => (k, series(rows)))
      .flatMap { case (k, xs) =>
        val (train, test) = Models.split75(xs)
        val steps = test.indices.map { i =>
          (k, i, train.length + i, xs)
        }
        steps :+ ((k, test.length, xs.length, xs)) // sentinel: final fit
      }
      .repartition(math.max(cores * 2, 8))
      .map { case (k, i, prefixLen, xs) =>
        val pred = Models.holtForecast(xs.take(prefixLen))
        val actual = if (prefixLen < xs.length) xs(prefixLen) else Double.NaN
        (k, i, pred, actual)
      }
      .groupByKey(_._1)
      .mapGroups { (profile, it) =>
        val steps = it.toArray
        val wf = steps.filter(t => !t._4.isNaN)
        val m = wf.map(t => { val e = t._3 - t._4; e * e }).sum / wf.length
        val finalPred = steps.maxBy(_._2)._3
        HoltResult(profile, m, finalPred)
      }
      .toDF()
      .orderBy(col("profile_name"))
  }

  final case class GridTask(
      profile_name: String,
      p: Int,
      d: Int,
      q: Int,
      mse: Double,
      xs: Array[Double]
  )

  /** ARIMA driver (`arima_models.py`): 50-config grid, walk-forward MSE,
    * 95% CI bounds (M9: prediction ± 1.96 × std_error,
    * `arima_models.py:216-217`), > 5 weeks history.
    *
    * The grid is DISTRIBUTED: each (profile, config) walk-forward is its
    * own task row (profiles × 50 configs), repartitioned across all
    * cores, then reduced to the min-MSE config per profile (deterministic
    * tie-break on the config tuple). The reference — and a naive
    * flatMapGroups port — runs each profile's 50-config grid serially in
    * one task, capping parallelism at #profiles; this shape keeps every
    * core busy regardless of profile count (measured ~10× at sf0.1).
    * Duplicating the (small) weekly series into each task row costs ~MBs.
    */
  def arimaJob(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val configs = for { p <- 0 until 5; d <- 0 until 2; q <- 0 until 5 } yield (p, d, q)
    val seriesDs: Dataset[(String, Array[Double])] =
      typedWeekly(s, dir, minWeeks = 5)
        .groupByKey(_.profile_name)
        .mapGroups((k, rows) => (k, series(rows)))
    val cores = s.sparkContext.defaultParallelism
    val scored: Dataset[GridTask] = seriesDs
      .flatMap { case (k, xs) => configs.map { case (p, d, q) => (k, p, d, q, xs) } }
      .repartition(math.max(cores * 2, 8))
      .map { case (k, p, d, q, xs) =>
        val m = scala.util
          .Try(Models.arimaWalkForward(xs, p, d, q))
          .toOption
          .flatten
          .map(_._1)
          .getOrElse(Double.NaN)
        GridTask(k, p, d, q, m, xs)
      }
    scored
      .filter(t => t.mse.isFinite)
      .groupByKey(_.profile_name)
      .reduceGroups { (a, b) =>
        val ord = implicitly[Ordering[(Double, Int, Int, Int)]]
        if (ord.lteq((a.mse, a.p, a.d, a.q), (b.mse, b.p, b.d, b.q))) a else b
      }
      .flatMap { case (_, t) =>
        // grid scored by fast HR walk-forward; the winning config's FINAL
        // parameters go HR → CSS (Nelder–Mead) → exact Kalman-filter MLE
        // — one optimization chain per profile, statsmodels-default
        // fidelity at negligible distributed cost
        Models.arimaFitMle(t.xs, t.p, t.d, t.q).map { fit =>
          ArimaResult(
            t.profile_name,
            s"(${t.p}, ${t.d}, ${t.q})",
            t.mse,
            fit.forecast,
            fit.stdError,
            fit.forecast - 1.96 * fit.stdError, // M9
            fit.forecast + 1.96 * fit.stdError
          )
        }
      }
      .toDF()
      .orderBy(col("profile_name"))
  }

  private def typedWeekly(s: SparkSession, dir: String, minWeeks: Int): Dataset[WeeklyRow] = {
    import s.implicits._
    weeklySeries(s, dir, minWeeks)
      .repartition(col("profile_name")) // co-locate each series in one task
      .as[WeeklyRow]
  }

  final case class HoltFixedResult(profile_name: String, level: Double, trend: Double, prediction: Double)

  /** Fixed-(α,β) Holt over each weekly series — the recursion itself
    * oracle-checked via a DuckDB recursive CTE (bit-exact replay).
    */
  def holtFixedJob(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    typedWeekly(s, dir, minWeeks = 10)
      .groupByKey(_.profile_name)
      .mapGroups { (profile, rows) =>
        val xs = series(rows)
        val (l, b) = Models.holtStateFixed(xs, alpha = 0.8, beta = 0.2)
        HoltFixedResult(profile, l, b, l + b)
      }
      .toDF()
      // ~300 recursion steps accumulate last-ulp differences vs the
      // oracle's recursive CTE (≤2e-15 rel); round far above the noise
      .select(
        col("profile_name"),
        round(col("level"), 6).as("level"),
        round(col("trend"), 6).as("trend"),
        round(col("prediction"), 6).as("prediction")
      )
      .orderBy(col("profile_name"))
  }

  final case class ArmaFixedResult(profile_name: String, prediction: Double, mse: Double)

  /** Fixed-(φ,θ) ARMA(1,1) innovations recursion over each weekly series —
    * the ARIMA analog of [[holtFixedJob]]: the recursion is oracle-checked
    * via a DuckDB recursive CTE (bit-exact replay), anchoring the ARMA
    * prediction arithmetic that the optimizer-driven `m_arima_forecast`
    * builds on.
    */
  def armaFixedJob(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    typedWeekly(s, dir, minWeeks = 10)
      .groupByKey(_.profile_name)
      .mapGroups { (profile, rows) =>
        val xs = series(rows)
        val (pred, mse) = Models.armaStateFixed(xs, phi = 0.5, theta = 0.3)
        ArmaFixedResult(profile, pred, mse)
      }
      .toDF()
      // same last-ulp guard as m_holt_fixed: ~300 sequential double ops
      .select(
        col("profile_name"),
        round(col("prediction"), 6).as("prediction"),
        round(col("mse"), 6).as("mse")
      )
      .orderBy(col("profile_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_arma_fixed"     -> (armaFixedJob(_, _)),
    "m_holt_fixed"     -> (holtFixedJob(_, _)),
    "m_ses_forecast"   -> (sesJob(_, _)),
    "m_holt_forecast"  -> (holtJob(_, _)),
    "m_arima_forecast" -> (arimaJob(_, _)),
    "m_weekly_series"  -> ((s, d) =>
      weeklySeries(s, d, minWeeks = 5).orderBy($"profile_name", $"week_date"))
  )

  /** The weekly series is SQL-expressible — oracle-checked. So is SES:
    * the smoothing recursion is a left fold, which DuckDB's list_reduce
    * replays in the identical double-op order (same multiply-add shape,
    * same `1 - 0.6` subtraction), so walk-forward MSE and the forecast
    * hash-match bit-exactly. Holt/ARIMA are iterative-optimizer output —
    * rows-only + ScalaTest goldens (BASELINE.md note).
    */
  val oracles: Map[String, String] = Map(
    "m_arma_fixed" ->
      """WITH RECURSIVE weekly AS (
        |  SELECT profile_name, week_date,
        |    CAST(SUM(CAST(l_quantity * p_retailprice / 100.0 AS DECIMAL(18,6))) AS DOUBLE) AS weight
        |  FROM (
        |    SELECT p_brand AS profile_name,
        |      CAST(date_trunc('week', l_shipdate) AS DATE) AS week_date,
        |      l_quantity, p_retailprice
        |    FROM lineitem JOIN part ON l_partkey = p_partkey
        |    WHERE l_shipdate < TIMESTAMP '2001-06-01') t
        |  GROUP BY profile_name, week_date
        |  QUALIFY COUNT(*) OVER (PARTITION BY profile_name) > 10),
        |series AS (
        |  SELECT profile_name, list(weight ORDER BY week_date) AS xs,
        |    list_reduce(list(weight ORDER BY week_date), (a, b) -> a + b)
        |      / len(list(weight ORDER BY week_date)) AS m
        |  FROM weekly GROUP BY profile_name),
        |arma AS (
        |  SELECT profile_name, xs, m, 0 AS i, m AS xhat, CAST(0.0 AS DOUBLE) AS sse
        |  FROM series
        |  UNION ALL
        |  SELECT profile_name, xs, m, i + 1,
        |    m + 0.5 * (xs[i + 1] - m) + 0.3 * (xs[i + 1] - xhat),
        |    sse + (xs[i + 1] - xhat) * (xs[i + 1] - xhat)
        |  FROM arma WHERE i < len(xs))
        |SELECT profile_name, round(xhat, 6) AS prediction,
        |  round(sse / len(xs), 6) AS mse
        |FROM arma WHERE i = len(xs) ORDER BY profile_name""".stripMargin,
    "m_holt_fixed" ->
      """WITH RECURSIVE weekly AS (
        |  SELECT profile_name, week_date,
        |    CAST(SUM(CAST(l_quantity * p_retailprice / 100.0 AS DECIMAL(18,6))) AS DOUBLE) AS weight
        |  FROM (
        |    SELECT p_brand AS profile_name,
        |      CAST(date_trunc('week', l_shipdate) AS DATE) AS week_date,
        |      l_quantity, p_retailprice
        |    FROM lineitem JOIN part ON l_partkey = p_partkey
        |    WHERE l_shipdate < TIMESTAMP '2001-06-01') t
        |  GROUP BY profile_name, week_date
        |  QUALIFY COUNT(*) OVER (PARTITION BY profile_name) > 10),
        |series AS (
        |  SELECT profile_name, list(weight ORDER BY week_date) AS xs
        |  FROM weekly GROUP BY profile_name),
        |holt AS (
        |  SELECT profile_name, xs, 1 AS i, xs[1] AS l, xs[2] - xs[1] AS b
        |  FROM series
        |  UNION ALL
        |  SELECT profile_name, xs, i + 1,
        |    0.8 * xs[i + 1] + (1 - 0.8) * (l + b),
        |    0.2 * ((0.8 * xs[i + 1] + (1 - 0.8) * (l + b)) - l) + (1 - 0.2) * b
        |  FROM holt WHERE i < len(xs))
        |SELECT profile_name, round(l, 6) AS level, round(b, 6) AS trend,
        |  round(l + b, 6) AS prediction
        |FROM holt WHERE i = len(xs) ORDER BY profile_name""".stripMargin,
    "m_ses_forecast" ->
      """WITH weekly AS (
        |  SELECT profile_name, week_date,
        |    CAST(SUM(CAST(l_quantity * p_retailprice / 100.0 AS DECIMAL(18,6))) AS DOUBLE) AS weight
        |  FROM (
        |    SELECT p_brand AS profile_name,
        |      CAST(date_trunc('week', l_shipdate) AS DATE) AS week_date,
        |      l_quantity, p_retailprice
        |    FROM lineitem JOIN part ON l_partkey = p_partkey
        |    WHERE l_shipdate < TIMESTAMP '2001-06-01') t
        |  GROUP BY profile_name, week_date
        |  QUALIFY COUNT(*) OVER (PARTITION BY profile_name) > 8),
        |series AS (
        |  SELECT profile_name, list(weight ORDER BY week_date) AS xs
        |  FROM weekly GROUP BY profile_name),
        |calc AS (
        |  SELECT profile_name, xs, len(xs) AS n,
        |    CAST(floor(len(xs) * 0.75) AS INT) AS sp
        |  FROM series),
        |wf AS (
        |  SELECT profile_name, xs, n, sp,
        |    [ xs[sp + i + 1] - list_reduce(xs[1:sp + i], (acc, x) -> 0.6 * x + (1 - 0.6) * acc)
        |      for i in range(0, n - sp) ] AS errs
        |  FROM calc)
        |SELECT profile_name,
        |  list_reduce([e * e for e in errs], (a, b) -> a + b) / (n - sp) AS mse,
        |  list_reduce(xs, (acc, x) -> 0.6 * x + (1 - 0.6) * acc) AS prediction
        |FROM wf ORDER BY profile_name""".stripMargin,
    "m_weekly_series" ->
      """SELECT profile_name, week_date,
        |  CAST(SUM(CAST(l_quantity * p_retailprice / 100.0 AS DECIMAL(18,6))) AS DOUBLE) AS weight
        |FROM (
        |  SELECT p_brand AS profile_name,
        |    CAST(date_trunc('week', l_shipdate) AS DATE) AS week_date,
        |    l_quantity, p_retailprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate < TIMESTAMP '2001-06-01') t
        |GROUP BY profile_name, week_date
        |QUALIFY COUNT(*) OVER (PARTITION BY profile_name) > 5
        |ORDER BY profile_name, week_date""".stripMargin
  )
}
