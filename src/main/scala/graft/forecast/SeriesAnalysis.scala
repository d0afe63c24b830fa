package graft.forecast

import graft.syntax._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series diagnostics and intermittent-demand models over the weekly
  * demand rollup — the analysis layer a forecasting warehouse runs BEFORE
  * picking a model family (the reference jumps straight to its three
  * models; `arima_models.py:193-213` assumes a dense series and
  * `holt_model.py` a trended one — these operators are how a user decides
  * which assumption holds).
  *
  * All three ride the gap-filled series ([[ForecastJobs.gapfillJob]]):
  * Croston is DEFINED on the zero-bearing series, and the moving-average /
  * autocovariance windows assume consecutive rows are consecutive weeks.
  *
  * Scale design: inputs are the weekly rollup (profiles × weeks — tiny
  * relative to the fact table even at 100 TB); every aggregation that sums
  * floats goes through the DECIMAL(38,18) cast so results are
  * partitioning-invariant and the DuckDB oracles match hash-exactly
  * (the [[graft.queries.Graph]] PageRank precedent). Float literals (0.2,
  * 0.8, 0.9) are written literally in BOTH engines — never derived as
  * `1 - α`, which lands on a different IEEE double than the parsed
  * literal.
  */
object SeriesAnalysis {
  type Q = (SparkSession, String) => DataFrame

  private val dec = DecimalType(38, 18)

  // ---------------------------------------------------------------- Croston

  final case class GapRow(
      profile_name: String,
      week_date: java.sql.Date,
      weight: Double,
      is_gap: Int
  )
  final case class CrostonRow(
      profile_name: String,
      demand_level: Double,
      interval_est: Double,
      forecast: Double,
      sba_forecast: Double
  )

  /** Croston's method (Croston 1972) with the Syntetos–Boylan (SBA)
    * bias-corrected variant, α = 0.2: separate SES recursions on the
    * non-zero demand sizes and on the inter-demand intervals; the demand
    * rate is their ratio. The per-profile fold is the same
    * `groupByKey.flatMapGroups` shape as the reference's model loop
    * (`simp_avg_model.py:182-199` — SURVEY §2.8 M1), parallel across
    * profiles after one shuffle.
    */
  def crostonJob(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ForecastJobs
      .gapfillJob(s, dir)
      .as[GapRow]
      .groupByKey(_.profile_name)
      .flatMapGroups { (profile, rows) =>
        val xs = rows.toArray.sortBy(_.week_date.getTime).map(_.weight)
        crostonFold(xs).iterator.map { case (z, p) =>
          CrostonRow(profile, z, p, z / p, 0.9 * z / p)
        }
      }
      .toDF()
      .select(
        col("profile_name"),
        round(col("demand_level"), 6).as("demand_level"),
        round(col("interval_est"), 6).as("interval_est"),
        round(col("forecast"), 6).as("forecast"),
        round(col("sba_forecast"), 6).as("sba_forecast")
      )
      .orderBy(col("profile_name"))
  }

  // ----------------------------------------------- seasonal decomposition

  /** Classical additive decomposition, period 13 (a quarterly cycle on
    * weekly data): trend = 13-wide centered moving average (defined only
    * where the full window exists), seasonal = per-phase mean of the
    * detrended series re-centered to zero mean across phases, residual =
    * the rest. Window sums ride the DECIMAL cast so the sliding-frame
    * association order cannot leak into the doubles.
    */
  def seasonalDecompJob(s: SparkSession, dir: String): DataFrame = {
    val byProf = Window.partitionBy($"profile_name")
    val ord    = Window.partitionBy($"profile_name").orderBy($"week_date")
    val ma     = ord.rowsBetween(-6, 6)

    val base = ForecastJobs
      .gapfillJob(s, dir)
      .withColumn("idx", row_number().over(ord))
      .withColumn(
        "trend",
        when(
          count(lit(1)).over(ma) === 13,
          sum($"weight".cast(dec)).over(ma).cast("double") / 13.0
        )
      )
      .withColumn("detr", $"weight" - $"trend")
      .withColumn("phase", ($"idx" - 1) % 13)

    val seasonal = base
      .groupBy($"profile_name", $"phase")
      .agg((sum($"detr".cast(dec)).cast("double") / count($"detr")).as("s_raw"))
      .withColumn(
        "seasonal",
        $"s_raw" -
          sum($"s_raw".cast(dec)).over(byProf).cast("double") /
          count($"s_raw").over(byProf)
      )
      .select($"profile_name", $"phase", $"seasonal")

    base
      .join(seasonal, Seq("profile_name", "phase"))
      .select(
        $"profile_name",
        $"week_date",
        $"weight",
        round($"trend", 6).as("trend"),
        round($"seasonal", 6).as("seasonal"),
        round($"weight" - $"trend" - $"seasonal", 6).as("resid")
      )
      .orderBy($"profile_name", $"week_date")
  }

  // -------------------------------------------------------------------- ACF

  val acfMaxLag = 6

  /** Sample autocorrelation, lags 1..6, per profile: one pass of `lead`
    * windows on the shared profile shuffle, one grouped aggregation of the
    * lagged products (DECIMAL partials), ratios and the lag unpivot on the
    * tiny per-profile result. No per-lag scan — the fact-side cost is the
    * gap-filled rollup once.
    */
  def acfJob(s: SparkSession, dir: String): DataFrame =
    acfCore(ForecastJobs.gapfillJob(s, dir))

  /** ACF over a caller-supplied gap-filled frame — split out so
    * [[ljungBoxJob]] can share ONE gapfill (r11 review: it built the
    * eagerly-checkpointed gapfill pipeline twice, doubling the query's
    * dominant fact-scan cost; the binsegJob/binsegCore pattern).
    */
  private[forecast] def acfCore(gap: DataFrame): DataFrame = {
    val ord = Window.partitionBy($"profile_name").orderBy($"week_date")

    val base = gap
      .withColumn(
        "mu",
        sum($"weight".cast(dec)).over(Window.partitionBy($"profile_name")).cast("double") /
          count(lit(1)).over(Window.partitionBy($"profile_name"))
      )
      .withColumn("dev", $"weight" - $"mu")

    val lagged = (1 to acfMaxLag).foldLeft(base) { (df, k) =>
      df.withColumn(s"d$k", lead($"dev", k).over(ord))
    }

    val sums = lagged
      .groupBy($"profile_name")
      .agg(
        sum(($"dev" * $"dev").cast(dec)).cast("double").as("c0"),
        (1 to acfMaxLag).map(k =>
          sum(($"dev" * col(s"d$k")).cast(dec)).cast("double").as(s"c$k")
        ): _*
      )

    val stackExpr = (1 to acfMaxLag).map(k => s"$k, c$k").mkString(s"stack($acfMaxLag, ", ", ", ") as (lag, ck)")
    sums
      .select($"profile_name", $"c0", expr(stackExpr))
      .select($"profile_name", $"lag", round($"ck" / $"c0", 6).as("acf"))
      .orderBy($"profile_name", $"lag")
  }

  final case class PacfRow(profile_name: String, lag: Int, pacf: Double)

  /** Partial autocorrelations via Durbin–Levinson — the other half of
    * the Box–Jenkins identification pair (ACF tails ⇒ MA order, PACF
    * cuts ⇒ AR order; together they justify the `m_arima_grid` search
    * space). Inputs are m_acf's ALREADY-ROUNDED autocorrelations — a
    * deterministic cross-engine anchor — and the recursion is a pure
    * sequential double fold per profile (the inner Σ φ_{k−1,j}·r_{k−j}
    * subtracts in ascending j, which the oracle replays as an ordered
    * list fold with the prepended-init trick). Six lags ⇒ depth-5
    * recursion; work after the ACF aggregate is lag-table-sized.
    */
  def pacfJob(s: SparkSession, dir: String): DataFrame = {
    import s.implicits.{newProductEncoder, newStringEncoder}
    acfJob(s, dir)
      .as[(String, Int, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (profile, rows) =>
        val r = rows.toArray.sortBy(_._2).map(_._3)
        val m = r.length
        val phi  = Array.ofDim[Double](m + 1, m + 1)
        val pacf = new Array[Double](m + 1)
        phi(1)(1) = r(0); pacf(1) = r(0)
        var v = 1.0 - r(0) * r(0)
        var k = 2
        while (k <= m) {
          var num = r(k - 1)
          var j   = 1
          while (j < k) { num = num - phi(k - 1)(j) * r(k - j - 1); j += 1 }
          val a = num / v
          pacf(k) = a
          phi(k)(k) = a
          j = 1
          while (j < k) { phi(k)(j) = phi(k - 1)(j) - a * phi(k - 1)(k - j); j += 1 }
          v = v * (1.0 - a * a)
          k += 1
        }
        (1 to m).iterator.map(l => PacfRow(profile, l, pacf(l)))
      }
      .toDF()
      .select(col("profile_name"), col("lag"), round(col("pacf"), 6).as("pacf"))
      .orderBy(col("profile_name"), col("lag"))
  }

  /** Ljung–Box portmanteau test per profile — "is this series white
    * noise?", the diagnostic run on residuals before trusting a model
    * and the natural consumer of m_acf's output:
    * Q = n(n+2) Σ_{k=1..6} ρ̂_k² / (n−k), rejected against the
    * χ²₀.₀₅(6) critical value. Inputs are the ALREADY-ROUNDED
    * autocorrelations (the m_pacf anchor discipline); the six per-lag
    * terms sum in DECIMAL so the reduction is order-free, and the
    * reject flag derives from the ONCE-ROUNDED Q (the m_cusum lesson:
    * never compare an unrounded double against a boundary the oracle
    * rounds).
    */
  def ljungBoxJob(s: SparkSession, dir: String): DataFrame = {
    // ONE gapfill for both the n count and the ACF (r11 review): each
    // gapfillJob call eagerly checkpoints the whole fact rollup
    val gap = ForecastJobs.gapfillJob(s, dir)
    val n = gap
      .groupBy($"profile_name")
      .agg(count(lit(1)).as("n"))
    val q = acfCore(gap)
      .join(n, Seq("profile_name"))
      .withColumn("term", ($"acf" * $"acf" / ($"n" - $"lag")).cast(dec))
      .groupBy($"profile_name", $"n")
      .agg(sum($"term").cast("double").as("ssum"))
      .withColumn("q_stat", round(($"n" * ($"n" + lit(2L))).cast("double") * $"ssum", 6))
    q.select(
      $"profile_name",
      $"n",
      $"q_stat",
      // χ²₀.₀₅(df=6) = 12.591587…, written to the same 6 dp as q_stat
      ($"q_stat" > lit(12.591587)).as("lb_reject")
    ).orderBy($"profile_name")
  }

  // ------------------------------------------------------- Holt-Winters

  final case class HwRow(
      profile_name: String,
      level: Double,
      trend: Double,
      seasonal_next: Double,
      prediction: Double
  )

  val hwPeriod = 13
  // fixed smoothing constants (α,β,γ) = (0.3,0.1,0.2) — written literally
  // in BOTH engines, complements as 0.7/0.9/0.8 literals (never 1-α); an
  // optimized-parameter path would follow the holtFit grid pattern

  /** Fixed-parameter additive Holt-Winters fold (α=0.3, β=0.1, γ=0.2;
    * sequential left folds mirrored by the oracle's recursive CTE) —
    * shared by [[holtWintersJob]] and the SQL face (`forecast_hw`) so
    * the two cannot drift: (level, trend, next-period seasonal) after
    * the pass, None under 2m+1 observations (no two full seasons to
    * initialize from).
    */
  private[graft] def hwFold(xs: Array[Double], m: Int): Option[(Double, Double, Double)] = {
    val n = xs.length
    if (n < 2 * m + 1) None
    else {
      var m1 = 0.0; var i = 0
      while (i < m) { m1 += xs(i); i += 1 }
      m1 /= m
      var m2 = 0.0; i = m
      while (i < 2 * m) { m2 += xs(i); i += 1 }
      m2 /= m
      var l = m1
      var b = (m2 - m1) / m
      val slist = Array.tabulate(m)(j => xs(j) - m1)
      var t = m
      while (t < n) {
        val sOld = slist(0)
        val lNew = 0.3 * (xs(t) - sOld) + 0.7 * (l + b)
        val bNew = 0.1 * (lNew - l) + 0.9 * b
        val sNew = 0.2 * (xs(t) - l - b) + 0.8 * sOld
        System.arraycopy(slist, 1, slist, 0, m - 1)
        slist(m - 1) = sNew
        l = lNew; b = bNew
        t += 1
      }
      Some((l, b, slist(0)))
    }
  }

  /** Additive Holt–Winters with fixed (α,β,γ) = (0.3,0.1,0.2), period 13 —
    * the triple-exponential member the reference's model set (SES, Holt,
    * ARIMA) stops short of. Standard init on the first two seasons
    * (level = season-1 mean, trend = season-over-season mean shift / m,
    * seasonals = season-1 deviations), recursion thereafter; h=1 forecast
    * = level + trend + matching seasonal. Same flatMapGroups shape as the
    * other per-profile models.
    */
  def holtWintersJob(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = hwPeriod
    ForecastJobs
      .gapfillJob(s, dir)
      .as[GapRow]
      .groupByKey(_.profile_name)
      .flatMapGroups { (profile, rows) =>
        val xs = rows.toArray.sortBy(_.week_date.getTime).map(_.weight)
        hwFold(xs, m).iterator.map { case (l, b, s0) => HwRow(profile, l, b, s0, l + b + s0) }
      }
      .toDF()
      .select(
        col("profile_name"),
        round(col("level"), 6).as("level"),
        round(col("trend"), 6).as("trend"),
        round(col("seasonal_next"), 6).as("seasonal_next"),
        round(col("prediction"), 6).as("prediction")
      )
      .orderBy(col("profile_name"))
  }

  // ------------------------------------------------------------- OLS trend

  /** Per-profile least-squares trend line over the gap-filled series
    * (x = week index): slope, intercept, and R² from the five moment
    * sums — the "is there a trend worth Holt over SES" test. Moments
    * accumulate as DECIMAL partials (map-side combine; one shuffle of
    * five numbers per profile), closed-form arithmetic on the tiny
    * per-profile row — the same exact-moments pattern as
    * `a_corr_matrix`.
    */
  def trendOlsJob(s: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy($"profile_name").orderBy($"week_date")
    ForecastJobs
      .gapfillJob(s, dir)
      .withColumn("i", row_number().over(ord).cast("long"))
      .groupBy($"profile_name")
      .agg(
        count(lit(1)).as("n"),
        sum($"i").as("sx"),
        sum($"i" * $"i").as("sxx"),
        sum($"weight".cast(dec)).cast("double").as("sy"),
        sum(($"i" * $"weight").cast(dec)).cast("double").as("sxy"),
        sum(($"weight" * $"weight").cast(dec)).cast("double").as("syy")
      )
      .select(
        $"profile_name",
        round(($"n" * $"sxy" - $"sx" * $"sy") / ($"n" * $"sxx" - $"sx" * $"sx"), 6).as("slope"),
        round(($"sy" - ($"n" * $"sxy" - $"sx" * $"sy") / ($"n" * $"sxx" - $"sx" * $"sx") * $"sx") / $"n", 6)
          .as("intercept"),
        round(
          (($"n" * $"sxy" - $"sx" * $"sy") * ($"n" * $"sxy" - $"sx" * $"sy")) /
            (($"n" * $"sxx" - $"sx" * $"sx") * ($"n" * $"syy" - $"sy" * $"sy")),
          6
        ).as("r2")
      )
      .orderBy($"profile_name")
  }

  final case class OlsSums(
      profile_name: String,
      xtx: Seq[Double], // 15 upper-triangle entries, row-major (k ≤ l)
      xty: Seq[Double], // 5 cross sums
      syy: Double
  )
  final case class OlsBeta(
      profile_name: String,
      b_intercept: Double,
      b_trend: Double,
      b_phase1: Double,
      b_phase2: Double,
      b_phase3: Double,
      r2: Double
  )

  /** Multivariate OLS per profile — demand regressed on trend + period-4
    * phase dummies, fit by DISTRIBUTED NORMAL EQUATIONS: the only
    * cluster-side work is one grouped aggregate producing the p(p+1)/2
    * X'X moments and p X'y cross moments per profile (DECIMAL addends,
    * order-free — the same "ship p²-sized state, not rows" shape as
    * [[graft.sim.Pca]]'s covariance); the 5×5 solve then runs INSIDE the
    * same typed pipeline via mapGroups-style Dataset.map (the M1
    * per-group-model precedent — no driver collect, profiles solve in
    * parallel). Elimination is fixed-order Gaussian (no pivoting — the
    * normal matrix is SPD), every loop ascending, back-substitution
    * subtracting ascending-j; the DuckDB oracle replays the elimination
    * as a 4-round recursive CTE over the augmented matrix and unrolls
    * the back-substitution with the identical fold order. R² comes from
    * the same moments (SSE = y'y − β'X'y), no second data pass.
    */
  def olsMultiJob(s: SparkSession, dir: String): DataFrame = {
    import s.implicits.{newProductEncoder, newStringEncoder}
    val ord = Window.partitionBy($"profile_name").orderBy($"week_date")
    val base = ForecastJobs
      .gapfillJob(s, dir)
      .withColumn("t", row_number().over(ord).cast("double"))
      .withColumn("ph", (($"t" - 1).cast("long") % 4))
      .withColumn("d1", ($"ph" === 1).cast("double"))
      .withColumn("d2", ($"ph" === 2).cast("double"))
      .withColumn("d3", ($"ph" === 3).cast("double"))
      .withColumn("y", $"weight")
    val xs = Seq(lit(1.0), $"t", $"d1", $"d2", $"d3")
    val xtxCols = for { k <- 0 until 5; l <- k until 5 } yield
      sum((xs(k) * xs(l)).cast(dec)).cast("double")
    val xtyCols = xs.map(x => sum((x * $"y").cast(dec)).cast("double"))
    base
      .groupBy($"profile_name")
      .agg(
        array(xtxCols: _*).as("xtx"),
        array(xtyCols: _*).as("xty"),
        sum(($"y" * $"y").cast(dec)).cast("double").as("syy")
      )
      .as[OlsSums]
      .map { su =>
        val p = 5
        // full augmented matrix from the packed upper triangle
        val a = Array.ofDim[Double](p, p + 1)
        var idx = 0
        for (k <- 0 until p; l <- k until p) {
          a(k)(l) = su.xtx(idx); a(l)(k) = su.xtx(idx); idx += 1
        }
        for (k <- 0 until p) a(k)(p) = su.xty(k)
        // forward elimination, fixed order, full-row update (mirrors SQL)
        for (k <- 0 until p - 1; i <- k + 1 until p) {
          val f = a(i)(k) / a(k)(k)
          for (j <- 0 to p) a(i)(j) = a(i)(j) - f * a(k)(j)
        }
        // back substitution, ascending-j subtraction
        val b = new Array[Double](p)
        var i = p - 1
        while (i >= 0) {
          var acc = a(i)(p)
          var j   = i + 1
          while (j < p) { acc -= a(i)(j) * b(j); j += 1 }
          b(i) = acc / a(i)(i)
          i -= 1
        }
        var bxy = 0.0
        for (k <- 0 until p) bxy += b(k) * su.xty(k)
        val n   = su.xtx(0)
        val sy  = su.xty(0)
        val sse = su.syy - bxy
        val sst = su.syy - sy * sy / n
        def r6(x: Double) =
          java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
        OlsBeta(su.profile_name, r6(b(0)), r6(b(1)), r6(b(2)), r6(b(3)), r6(b(4)),
          r6(1.0 - sse / sst))
      }
      .toDF()
      .orderBy($"profile_name")
  }

  // ----------------------------------------- shared smoothing folds
  // ONE Scala definition per recursion (r6 self-review): m_croston,
  // m_holt_damped and the backtest scorecard must race the IDENTICAL
  // arithmetic, or a coefficient tweak in one site silently desyncs the
  // others from their oracles — the same hazard the shared oracle vals
  // (trIters, kCoreK, milestoneCents) guard against on the SQL side.

  /** Damped-Holt (α=0.3, β=0.1, φ=0.9) fold over a full series: final
    * (level, trend). Requires xs.length ≥ 2.
    */
  private[forecast] def dampedFold(xs: Array[Double]): (Double, Double) = {
    var l = xs(0); var b = xs(1) - xs(0); var i = 1
    while (i < xs.length) {
      val l2 = 0.3 * xs(i) + 0.7 * (l + 0.9 * b)
      b = 0.1 * (l2 - l) + 0.9 * (0.9 * b)
      l = l2; i += 1
    }
    (l, b)
  }

  /** Σ_{j=1..h} φ^j for h = 1..5 as explicit literal chains — written
    * out (never pow()) so the oracle CASE arms replay the same IEEE
    * product/addition order.
    */
  private[forecast] val dampedMult: Array[Double] = Array(
    0.9,
    0.9 + 0.9 * 0.9,
    0.9 + 0.9 * 0.9 + 0.9 * 0.9 * 0.9,
    0.9 + 0.9 * 0.9 + 0.9 * 0.9 * 0.9 + 0.9 * 0.9 * 0.9 * 0.9,
    0.9 + 0.9 * 0.9 + 0.9 * 0.9 * 0.9 + 0.9 * 0.9 * 0.9 * 0.9 + 0.9 * 0.9 * 0.9 * 0.9 * 0.9
  )

  /** Croston (α=0.2) fold: final (size level, interval level), or None
    * for an all-zero series. Shared with the SQL face
    * (`forecast_croston`) so the two cannot drift.
    */
  private[graft] def crostonFold(xs: Array[Double]): Option[(Double, Double)] = {
    val f = xs.indexWhere(_ > 0)
    if (f < 0) None
    else {
      var z = xs(f); var p = (f + 1).toDouble; var q = 1; var i = f + 1
      while (i < xs.length) {
        if (xs(i) > 0) { z = 0.2 * xs(i) + 0.8 * z; p = 0.2 * q + 0.8 * p; q = 1 }
        else q += 1
        i += 1
      }
      Some((z, p))
    }
  }

  // ------------------------------------------------ backtest scorecard

  final case class FcRow(
      profile_name: String,
      method: String,
      horizon: Int,
      forecast: Double,
      actual: Double
  )

  /** Holdout length for the scorecard — shared with the oracle. */
  private[forecast] val backtestHoldout = 5

  /** Model-selection scorecard — the reference's core loop (fit several
    * models per profile, score on a holdout, pick a winner; SURVEY §2.8
    * M1–M4) generalized across the smoothing family: SES (α=0.6, M7's
    * coefficient), Holt (0.8/0.2), damped Holt (0.3/0.1/φ=0.9) and
    * Croston (0.2/0.8) each train on all but the last five weeks and
    * forecast the holdout; per-(profile, method) MSE ranks the methods.
    * All four are pure sequential IEEE folds with literal coefficients
    * (no decimal-moment models — Theta's OLS stage would drag the
    * moment-sum discipline into Scala code, so it races elsewhere);
    * squared errors are rounded ONCE at 9 dp into DECIMAL(20,9) so the
    * per-method sums are associative, and the winner rank orders by
    * (mse, method) — a total order. One shuffle; profiles are the
    * parallel unit.
    */
  def backtestJob(s: SparkSession, dir: String): DataFrame = {
    // encoders only — the full bundle's `$` clashes with graft.syntax's
    import s.implicits.{newProductEncoder, newStringEncoder}
    val fc = ForecastJobs
      .gapfillJob(s, dir)
      .as[GapRow]
      .groupByKey(_.profile_name)
      .flatMapGroups { (profile, rows) =>
        val xs = rows.toArray.sortBy(_.week_date.getTime).map(_.weight)
        val n  = xs.length
        if (n < backtestHoldout + 2) Iterator.empty
        else {
          val tr   = xs.take(n - backtestHoldout)
          val hold = xs.drop(n - backtestHoldout)
          val out  = Array.newBuilder[FcRow]
          var z = tr(0); var i = 1
          while (i < tr.length) { z = 0.6 * tr(i) + 0.4 * z; i += 1 }
          for (h <- 1 to backtestHoldout) out += FcRow(profile, "ses", h, z, hold(h - 1))
          var l = tr(0); var b = tr(1) - tr(0); i = 1
          while (i < tr.length) {
            val l2 = 0.8 * tr(i) + 0.2 * (l + b)
            b = 0.2 * (l2 - l) + 0.8 * b
            l = l2; i += 1
          }
          for (h <- 1 to backtestHoldout) out += FcRow(profile, "holt", h, l + h * b, hold(h - 1))
          val (dl, db) = dampedFold(tr)
          for (h <- 1 to backtestHoldout)
            out += FcRow(profile, "damped", h, dl + dampedMult(h - 1) * db, hold(h - 1))
          crostonFold(tr).foreach { case (cz, p) =>
            for (h <- 1 to backtestHoldout)
              out += FcRow(profile, "croston", h, cz / p, hold(h - 1))
          }
          out.result().iterator
        }
      }
      .toDF()
    val rankW = Window.partitionBy($"profile_name").orderBy($"mse", $"method")
    fc.select(
        $"profile_name",
        $"method",
        round(($"forecast" - $"actual") * ($"forecast" - $"actual"), 9)
          .cast(dec209).as("se")
      )
      .groupBy($"profile_name", $"method")
      .agg(count(lit(1)).as("n_h"), sum($"se").as("sse"))
      .select($"profile_name", $"method", round($"sse".cast("double") / $"n_h", 6).as("mse"))
      .withColumn("rank", row_number().over(rankW).cast("int"))
      .orderBy($"profile_name", $"rank")
  }

  private val dec209 = DecimalType(20, 9)

  // ---------------------------------------------------- damped Holt

  final case class DampedRow(
      profile_name: String,
      horizon: Int,
      level: Double,
      trend: Double,
      forecast: Double
  )

  /** Damped-trend Holt (Gardner & McKenzie 1985) — the linear-trend
    * smoother with the φ damping that made it the M-competition's
    * safe default: an undamped Holt extrapolates its last trend forever
    * (wildly optimistic at long horizons), while φ=0.9 geometrically
    * flattens the projection toward a finite asymptote. Same fold shape
    * and literal-coefficient discipline as `m_holt_fixed` (α=0.3 β=0.1,
    * every product written literally); the h-step trend multiplier
    * Σφ^j is spelled out as explicit literal chains on both engines so
    * no pow() enters. Emits horizons 1..3 per profile.
    */
  def holtDampedJob(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ForecastJobs
      .gapfillJob(s, dir)
      .as[GapRow]
      .groupByKey(_.profile_name)
      .flatMapGroups { (profile, rows) =>
        val xs = rows.toArray.sortBy(_.week_date.getTime).map(_.weight)
        if (xs.length < 2) Iterator.empty
        else {
          val (l, b) = dampedFold(xs)
          (1 to 3).iterator.map(h => DampedRow(profile, h, l, b, l + dampedMult(h - 1) * b))
        }
      }
      .toDF()
      .select(
        col("profile_name"),
        col("horizon"),
        round(col("level"), 6).as("level"),
        round(col("trend"), 6).as("trend"),
        round(col("forecast"), 6).as("forecast")
      )
      .orderBy(col("profile_name"), col("horizon"))
  }

  // ------------------------------------------------------------- TSB

  final case class TsbRow(
      profile_name: String,
      prob_demand: Double,
      demand_level: Double,
      forecast: Double
  )

  /** TSB method (Teunter–Syntetos–Babai 2011) — the Croston variant that
    * handles OBSOLESCENCE: Croston's interval estimate only updates when
    * demand occurs, so a dead item keeps its stale forecast forever; TSB
    * instead smooths a demand PROBABILITY every period (α=0.1, toward 1
    * on demand, toward 0 on none) while the size level updates on demand
    * periods only (β=0.2). Forecast = probability × size, decaying to
    * zero as an item dies. Seeds mirror `m_croston`: size on the first
    * demand, probability at 1/position. Same per-profile fold shape;
    * same literal-coefficient discipline (0.1/0.2/0.8 written literally
    * on both engines, never derived).
    */
  def tsbJob(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ForecastJobs
      .gapfillJob(s, dir)
      .as[GapRow]
      .groupByKey(_.profile_name)
      .flatMapGroups { (profile, rows) =>
        val xs = rows.toArray.sortBy(_.week_date.getTime).map(_.weight)
        val f  = xs.indexWhere(_ > 0)
        if (f < 0) Iterator.empty
        else {
          var z = xs(f)
          var p = 1.0 / (f + 1)
          var i = f + 1
          while (i < xs.length) {
            if (xs(i) > 0) {
              z = 0.2 * xs(i) + 0.8 * z
              p = p + 0.1 * (1.0 - p)
            } else p = p + 0.1 * (0.0 - p)
            i += 1
          }
          Iterator.single(TsbRow(profile, p, z, p * z))
        }
      }
      .toDF()
      .select(
        col("profile_name"),
        round(col("prob_demand"), 6).as("prob_demand"),
        round(col("demand_level"), 6).as("demand_level"),
        round(col("forecast"), 6).as("forecast")
      )
      .orderBy(col("profile_name"))
  }

  // ------------------------------------------------------------ Theta

  final case class ThetaRow(
      profile_name: String,
      horizon: Int,
      theta_level: Double,
      trend_component: Double,
      forecast: Double
  )

  /** Forecast horizon for the Theta method — shared with the oracle. */
  private[forecast] val thetaHorizon = 5

  /** Theta method (Assimakopoulos & Nikolopoulos 2000, the M3-competition
    * winner): decompose the series into the θ=0 line (the OLS trend, pure
    * long-run signal) and the θ=2 line (2·x − trend, doubled local
    * curvature), forecast the θ=2 line with SES (α = 0.2, flat at the
    * final level) and the θ=0 line by extrapolation, and average the two.
    * Composes the two already-proven pieces: the trend comes from the
    * SAME one-pass DECIMAL moment sums and 6-dp once-rounding as
    * `m_trend_ols` (theta2 rows then use the rounded slope/intercept, so
    * every downstream number derives from a cross-engine-identical
    * anchor), and the SES recursion is the literal-α fold `m_croston`
    * pins. Per-profile fold after one shuffle (M1 shape); the oracle
    * replays OLS closed-form + the recursion + the horizon arithmetic.
    */
  def thetaJob(s: SparkSession, dir: String): DataFrame = {
    import s.implicits.{newProductEncoder, newStringEncoder}
    val ord = Window.partitionBy($"profile_name").orderBy($"week_date")
    val g = ForecastJobs
      .gapfillJob(s, dir)
      .withColumn("i", row_number().over(ord).cast("long"))
    val ols = g
      .groupBy($"profile_name")
      .agg(
        count(lit(1)).as("n"),
        sum($"i").as("sx"),
        sum($"i" * $"i").as("sxx"),
        sum($"weight".cast(dec)).cast("double").as("sy"),
        sum(($"i" * $"weight").cast(dec)).cast("double").as("sxy")
      )
      .select(
        $"profile_name",
        $"n",
        round(($"n" * $"sxy" - $"sx" * $"sy") / ($"n" * $"sxx" - $"sx" * $"sx"), 6).as("slope"),
        round(($"sy" - ($"n" * $"sxy" - $"sx" * $"sy") / ($"n" * $"sxx" - $"sx" * $"sx") * $"sx") / $"n", 6)
          .as("intercept")
      )
    g.join(ols, "profile_name")
      .select(
        $"profile_name", $"i", $"n", $"slope", $"intercept",
        (lit(2.0) * $"weight" - ($"intercept" + $"slope" * $"i")).as("theta2")
      )
      .as[(String, Long, Long, Double, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (profile, rows) =>
        val arr = rows.toArray.sortBy(_._2)
        val (_, _, n, slope, intercept, _) = arr.head
        var z = arr.head._6
        var t = 1
        while (t < arr.length) { z = 0.2 * arr(t)._6 + 0.8 * z; t += 1 }
        (1 to thetaHorizon).iterator.map { h =>
          val trendH = intercept + slope * (n + h)
          ThetaRow(profile, h, z, trendH, 0.5 * (z + trendH))
        }
      }
      .toDF()
      .select(
        $"profile_name",
        $"horizon",
        round($"theta_level", 6).as("theta_level"),
        round($"trend_component", 6).as("trend_component"),
        round($"forecast", 6).as("forecast")
      )
      .orderBy($"profile_name", $"horizon")
  }

  // ------------------------------------------------------------ CUSUM

  /** CUSUM drift monitor: running sum of deviations from the profile mean,
    * flagged where |cusum| exceeds 5σ — the "did the demand level shift"
    * changepoint screen (a pointwise z-score like `e_anomalies` misses
    * slow drifts that accumulate; CUSUM is the standard answer). Mean and
    * σ come from the same one-pass DECIMAL moment sums as the OLS trend;
    * the running sum is an exact DECIMAL cumulative window on the profile
    * shuffle.
    */
  def cusumJob(s: SparkSession, dir: String): DataFrame = {
    val byProf = Window.partitionBy($"profile_name")
    val run = Window
      .partitionBy($"profile_name")
      .orderBy($"week_date")
      .rowsBetween(Window.unboundedPreceding, 0)
    ForecastJobs
      .gapfillJob(s, dir)
      .withColumn("n", count(lit(1)).over(byProf))
      .withColumn("sy", sum($"weight".cast(dec)).over(byProf).cast("double"))
      .withColumn("syy", sum(($"weight" * $"weight").cast(dec)).over(byProf).cast("double"))
      .withColumn("sigma", sqrt(($"syy" - $"sy" * $"sy" / $"n") / ($"n" - 1)))
      .withColumn("dev", $"weight" - $"sy" / $"n")
      // once-rounded discipline (the e_anomalies_mad precedent): the running
      // sum stays DECIMAL(38,18) and is rounded ONCE in DECIMAL — exact
      // arithmetic both engines replay bit-for-bit — before any double cast.
      // Rounding the post-cast double instead (Spark = BigDecimal HALF_UP on
      // the exact binary value, DuckDB = scaled float math) disagrees in the
      // last ULP on tie-adjacent values. drift_flag derives from the same
      // once-rounded value so the 5σ compare sees identical inputs too.
      .withColumn("cusum_r", round(sum($"dev".cast(dec)).over(run), 6))
      .select(
        $"profile_name",
        $"week_date",
        $"cusum_r".cast("double").as("cusum"),
        ($"cusum_r".cast("double") > lit(5.0) * $"sigma" ||
          $"cusum_r".cast("double") < lit(-5.0) * $"sigma").cast("int").as("drift_flag")
      )
      .orderBy($"profile_name", $"week_date")
  }

  // ------------------------------------------------------ inventory sim

  final case class InvRow(
      profile_name: String,
      final_stock: Double,
      lost_sales: Double,
      n_orders: Int,
      service_rate: Double
  )

  /** Lost-sales inventory simulation under an (R, Q) reorder policy with
    * one-week lead time — the decision layer the reference's demand
    * forecasts feed. Per profile over the gap-filled weekly demand:
    * start stock 4·mean, reorder point 2·mean, order quantity 4·mean;
    * at most one order outstanding (lead time 1 ⇒ an order placed at
    * week t arrives at t+1, before the next decision). Reports final
    * stock, lost sales, order count, and the demand fill rate. The
    * sequential fold is per-profile (embarrassingly parallel after one
    * shuffle); the DuckDB oracle replays it as a recursive CTE.
    */
  def inventorySimJob(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ForecastJobs
      .gapfillJob(s, dir)
      .as[GapRow]
      .groupByKey(_.profile_name)
      .flatMapGroups { (profile, rows) =>
        val xs = rows.toArray.sortBy(_.week_date.getTime).map(_.weight)
        val n  = xs.length
        // sequential left fold for the mean — list_reduce in the oracle
        var tot = 0.0; var i = 0
        while (i < n) { tot += xs(i); i += 1 }
        val m = tot / n
        val q = 4.0 * m; val r = 2.0 * m
        var stock   = 4.0 * m
        var pending = false
        var lost    = 0.0
        var orders  = 0
        i = 0
        while (i < n) {
          val avail = stock + (if (pending) q else 0.0)
          stock = math.max(avail - xs(i), 0.0)
          lost = lost + math.max(xs(i) - avail, 0.0)
          pending = stock < r
          if (pending) orders += 1
          i += 1
        }
        Iterator.single(InvRow(profile, stock, lost, orders, (tot - lost) / tot))
      }
      .toDF()
      .select(
        col("profile_name"),
        round(col("final_stock"), 6).as("final_stock"),
        round(col("lost_sales"), 6).as("lost_sales"),
        col("n_orders"),
        round(col("service_rate"), 6).as("service_rate")
      )
      .orderBy(col("profile_name"))
  }

  // ------------------------------------------------- binary segmentation

  /** Two-level binary-segmentation changepoint detection — the
    * localization step behind the CUSUM screen (`m_cusum` says "the
    * level shifted somewhere"; binseg says WHERE): cp1 is the split that
    * minimizes total within-segment SSE, cp2 the best further split of
    * either resulting half (the greedy recursion truncated at depth 2,
    * the standard stopping point when the gain ratio is the decision
    * input).
    *
    * Determinism design — integer prefix sums, zero libm, zero decimal
    * casts. The SSE of segment [a,b] is (Σy²)−(Σy)²/m, and every SSE
    * DIFFERENCE binseg ranks (cost of a split vs its parent segment)
    * cancels the Σy² term, so the whole job reduces to Σy prefixes
    * alone. Weights are 6-dp decimals by construction, so wi = w·10⁶ is
    * an exact BIGINT; prefix sums stay < 2⁵³ (3 400 weeks × 10¹¹
    * quanta), so their doubles are EXACT and every downstream ×/÷ is a
    * single correctly-rounded IEEE op — bit-identical in any engine, at
    * any SF, with no DECIMAL(38,18)→double two-rounding hazard (the
    * first cut of this job rounded ~10¹⁰-magnitude SSEs at a fixed
    * decimal grid and flipped at sf0.1 exactly that way). Split ranking
    * compares those bit-identical doubles directly (earlier week as
    * tiebreak — gap-filled series have exactly-flat zero stretches whose
    * splits tie EXACTLY); reported gains go through floor(), which
    * unlike round() is a pure function of the binary value in both
    * engines. One ordered window on the profile shuffle, every split
    * scored map-side from its prefix row — no per-split pass, no driver
    * loop, O(n) per profile. Min segment length 2 on both levels.
    */
  def binsegJob(s: SparkSession, dir: String): DataFrame =
    binsegCore(ForecastJobs.gapfillJob(s, dir))

  /** Core over any (profile_name, week_date, weight) frame — split out so
    * the spec can run it on a planted-step series.
    */
  private[forecast] def binsegCore(gap: DataFrame): DataFrame = {
    val byProf = Window.partitionBy($"profile_name")
    val ord    = byProf.orderBy($"week_date")
    val run    = ord.rowsBetween(Window.unboundedPreceding, 0)
    val base = gap
      .withColumn("wi", round($"weight" * lit(1000000.0)).cast("long"))
      .withColumn("t", row_number().over(ord).cast("long"))
      .withColumn("sy", sum($"wi").over(run))
      .withColumn("n", count(lit(1)).over(byProf))
      .withColumn("ty", sum($"wi").over(byProf))
      .localCheckpoint() // consumed by three branches below
    // (Σy)²/m of a segment given its Σy quanta and length — the only
    // non-integer arithmetic in the job: square and divide, one IEEE
    // rounding each, on EXACT double operands
    def seg(sy: org.apache.spark.sql.Column,
        m: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val d = sy.cast("double"); d * d / m
    }
    // argmin of cost(t) = Σy²_tot − g(t) ⇔ argmax of g(t)
    val scored = base
      .filter($"t" >= 2 && $"t" <= $"n" - 2)
      .withColumn("g", seg($"sy", $"t") + seg($"ty" - $"sy", $"n" - $"t"))
    val cp1 = scored
      .withColumn("rn", row_number().over(byProf.orderBy($"g".desc, $"t")))
      .filter($"rn" === 1)
      .select(
        $"profile_name", $"n".as("n1"), $"ty".as("ty1"),
        $"t".as("w"), $"week_date".as("cp1_week"),
        $"sy".as("syw"), $"g".as("g1"))
    // level 2: candidates re-scored INSIDE the half they fall in, via
    // prefix differences against the level-1 winner's row (the Σy²
    // terms of the half cancel, leaving pure Σy arithmetic again)
    val cand = base
      .join(cp1, "profile_name")
      .withColumn(
        "red",
        when($"t" >= 2 && $"t" <= $"w" - 2,
          seg($"sy", $"t") + seg($"syw" - $"sy", $"w" - $"t") - seg($"syw", $"w"))
          .when($"t" >= $"w" + 2 && $"t" <= $"n" - 2,
            seg($"sy" - $"syw", $"t" - $"w") + seg($"ty" - $"sy", $"n" - $"t") -
              seg($"ty" - $"syw", $"n" - $"w")))
      .filter($"red".isNotNull)
    val cp2 = cand
      .withColumn("rn", row_number().over(byProf.orderBy($"red".desc, $"t")))
      .filter($"rn" === 1)
      // ÷10¹² de-scales quanta² back to natural units (exact
      // power-of-ten double, one rounding), floor pins the integer
      .select($"profile_name", $"week_date".as("cp2_week"),
        floor($"red" / lit(1.0e12)).cast("long").as("cp2_gain"))
    cp1
      .select(
        $"profile_name",
        $"n1".cast("long").as("n"),
        $"cp1_week",
        floor(($"g1" - seg($"ty1", $"n1")) / lit(1.0e12)).cast("long").as("cp1_gain"))
      .join(cp2, Seq("profile_name"), "left")
      .orderBy($"profile_name")
  }

    // ------------------------------------------------------ rolling corr

  /** Rolling 13-week Pearson correlation of each profile against the
    * corpus-wide weekly total — the "does this brand move with the
    * market" co-movement screen (a profile decorrelating from the
    * market is a merchandising signal the pointwise anomaly screens
    * cannot see). Determinism design: both series are rounded to WHOLE
    * units (round-half of exact 6-dp values — .5 ties are exact doubles
    * and round away from zero in both engines), so every window moment
    * is an exact LONG sum whose double is exact (< 2⁵³ at these SFs; a
    * larger deployment re-scales the unit), and the correlation is pure
    * identical-IEEE arithmetic ending in one sqrt (correctly rounded).
    * Flat windows (zero variance — gap-filled zero stretches) emit NULL
    * rather than dividing. One profile-window pass + one week-keyed
    * total join.
    */
  val corrWin = 13
  def rollingCorrJob(s: SparkSession, dir: String): DataFrame = {
    val g = ForecastJobs
      .gapfillJob(s, dir)
      .select($"profile_name", $"week_date", round($"weight").cast("long").as("x"))
    val tot = g.groupBy($"week_date").agg(sum($"x").as("y"))
    val w13 = Window
      .partitionBy($"profile_name")
      .orderBy($"week_date")
      .rowsBetween(-(corrWin - 1), 0)
    val m = g
      .join(tot, "week_date")
      .withColumn("mct", count(lit(1)).over(w13))
      .withColumn("sx", sum($"x").over(w13).cast("double"))
      .withColumn("sy", sum($"y").over(w13).cast("double"))
      .withColumn("sxx", sum($"x" * $"x").over(w13).cast("double"))
      .withColumn("syy", sum($"y" * $"y").over(w13).cast("double"))
      .withColumn("sxy", sum($"x" * $"y").over(w13).cast("double"))
      .filter($"mct" === corrWin)
    val n   = lit(corrWin.toDouble)
    val num = n * $"sxy" - $"sx" * $"sy"
    val den = (n * $"sxx" - $"sx" * $"sx") * (n * $"syy" - $"sy" * $"sy")
    m.select(
        $"profile_name",
        $"week_date",
        when(den > lit(0.0), round(num / sqrt(den), 6)).as("corr13"))
      .orderBy($"profile_name", $"week_date")
  }

  // ---------------------------------------------------------------- oracles

  /** The gap-filled weekly series as a shared CTE — the `t_gapfill` oracle
    * verbatim minus its ORDER BY.
    */
  private val gapCte =
    """gap AS MATERIALIZED (
      |  WITH weekly AS (
      |    SELECT profile_name, week_date,
      |      CAST(SUM(CAST(l_quantity * p_retailprice / 100.0 AS DECIMAL(18,6))) AS DOUBLE) AS weight
      |    FROM (
      |      SELECT p_brand AS profile_name,
      |        CAST(date_trunc('week', l_shipdate) AS DATE) AS week_date,
      |        l_quantity, p_retailprice
      |      FROM lineitem JOIN part ON l_partkey = p_partkey
      |      WHERE l_shipdate < TIMESTAMP '2001-06-01') t
      |    GROUP BY profile_name, week_date
      |    QUALIFY COUNT(*) OVER (PARTITION BY profile_name) > 5),
      |  b AS (
      |    SELECT profile_name, min(week_date) AS wmin, max(week_date) AS wmax
      |    FROM weekly GROUP BY profile_name),
      |  spine AS (
      |    SELECT profile_name, CAST(unnest(generate_series(wmin, wmax, INTERVAL 7 DAY)) AS DATE) AS week_date
      |    FROM b)
      |  SELECT s.profile_name, s.week_date, coalesce(w.weight, 0.0) AS weight
      |  FROM spine s LEFT JOIN weekly w USING (profile_name, week_date))""".stripMargin

  /** The m_seasonal_decomp replay, extracted so m_seasonality_strength
    * can wrap it as a subquery — one definition, two consumers.
    */
  private val seasonalDecompSql: String =
    s"""WITH $gapCte,
      |base AS (
      |  SELECT profile_name, week_date, weight,
      |    row_number() OVER w AS idx,
      |    CASE WHEN COUNT(*) OVER ma = 13
      |         THEN CAST(SUM(CAST(weight AS DECIMAL(38,18))) OVER ma AS DOUBLE) / 13.0
      |    END AS trend
      |  FROM gap
      |  WINDOW w AS (PARTITION BY profile_name ORDER BY week_date),
      |    ma AS (PARTITION BY profile_name ORDER BY week_date
      |           ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING)),
      |detr AS (
      |  SELECT *, weight - trend AS detr, (idx - 1) % 13 AS phase FROM base),
      |sea AS (
      |  SELECT profile_name, phase,
      |    CAST(SUM(CAST(detr AS DECIMAL(38,18))) AS DOUBLE) / COUNT(detr) AS s_raw
      |  FROM detr GROUP BY profile_name, phase),
      |sea_adj AS (
      |  SELECT profile_name, phase,
      |    s_raw - CAST(SUM(CAST(s_raw AS DECIMAL(38,18))) OVER p AS DOUBLE)
      |            / COUNT(s_raw) OVER p AS seasonal
      |  FROM sea WINDOW p AS (PARTITION BY profile_name))
      |SELECT d.profile_name, d.week_date, d.weight,
      |  round(d.trend, 6) AS trend,
      |  round(a.seasonal, 6) AS seasonal,
      |  round(d.weight - d.trend - a.seasonal, 6) AS resid
      |FROM detr d JOIN sea_adj a USING (profile_name, phase)
      |ORDER BY profile_name, week_date""".stripMargin

  /** Seasonality / trend strength (Hyndman's STL-feature form): per
    * profile, 1 − Var(resid)/Var(seasonal + resid) and
    * 1 − Var(resid)/Var(trend + resid), floored at 0 — the "which
    * profiles actually carry seasonal structure" triage that decides
    * whether m_hw_fixed's seasonal machinery is worth running. Inputs
    * are m_seasonal_decomp's ALREADY-ROUNDED components (deterministic
    * anchors), component sums are per-row IEEE, variances come from
    * DECIMAL moment sums with the population-n denominator, and the
    * final ratios round once at 6 dp.
    */
  def seasonalityStrengthJob(s: SparkSession, dir: String): DataFrame =
    seasonalDecompJob(s, dir)
      .filter($"trend".isNotNull)
      .withColumn("sr", $"seasonal" + $"resid")
      .withColumn("tr", $"trend" + $"resid")
      .groupBy($"profile_name")
      .agg(
        count(lit(1)).as("n"),
        sum($"resid".cast(dec)).cast("double").as("s_r"),
        sum(($"resid" * $"resid").cast(dec)).cast("double").as("s_rr"),
        sum($"sr".cast(dec)).cast("double").as("s_sr"),
        sum(($"sr" * $"sr").cast(dec)).cast("double").as("s_srr"),
        sum($"tr".cast(dec)).cast("double").as("s_tr"),
        sum(($"tr" * $"tr").cast(dec)).cast("double").as("s_trr")
      )
      .select(
        $"profile_name",
        $"n",
        round(
          greatest(
            lit(0.0),
            lit(1.0) - (($"s_rr" - $"s_r" * $"s_r" / $"n") / ($"s_srr" - $"s_sr" * $"s_sr" / $"n"))
          ),
          6
        ).as("seasonal_strength"),
        round(
          greatest(
            lit(0.0),
            lit(1.0) - (($"s_rr" - $"s_r" * $"s_r" / $"n") / ($"s_trr" - $"s_tr" * $"s_tr" / $"n"))
          ),
          6
        ).as("trend_strength")
      )
      .orderBy($"profile_name")

  /** Seasonally-adjusted anomalies — z-scores on the DECOMPOSITION
    * RESIDUALS rather than raw values: a pointwise screen over raw
    * demand (e_anomalies) flags every holiday season; scoring what's
    * left after trend and seasonality are removed flags only what the
    * profile's own structure cannot explain. Moments of the rounded
    * residuals ride DECIMAL sums (sample σ, the e_anomalies convention);
    * emits the |z| > 3 rows with the once-rounded score.
    */
  def seasonalAnomaliesJob(s: SparkSession, dir: String): DataFrame = {
    val byProf = Window.partitionBy($"profile_name")
    seasonalDecompJob(s, dir)
      .filter($"trend".isNotNull)
      .withColumn("n", count(lit(1)).over(byProf))
      .withColumn("s_r", sum($"resid".cast(dec)).over(byProf).cast("double"))
      .withColumn("s_rr", sum(($"resid" * $"resid").cast(dec)).over(byProf).cast("double"))
      .withColumn("mu", $"s_r" / $"n")
      .withColumn("sigma", sqrt(($"s_rr" - $"s_r" * $"s_r" / $"n") / ($"n" - 1)))
      .withColumn("z", ($"resid" - $"mu") / $"sigma")
      .filter(abs($"z") > 3.0)
      .select(
        $"profile_name",
        $"week_date",
        $"weight",
        $"resid",
        round($"z", 6).as("z_score")
      )
      .orderBy($"profile_name", $"week_date")
  }

  val queries: Map[String, Q] = Map(
    "m_croston"         -> (crostonJob(_, _)),
    "m_seasonal_decomp" -> (seasonalDecompJob(_, _)),
    "m_seasonality_strength" -> (seasonalityStrengthJob(_, _)),
    "e_anomalies_seasonal" -> (seasonalAnomaliesJob(_, _)),
    "m_pacf"            -> (pacfJob(_, _)),
    "m_ljung_box"       -> (ljungBoxJob(_, _)),
    "m_ols_multi"       -> (olsMultiJob(_, _)),
    "m_acf"             -> (acfJob(_, _)),
    "m_hw_fixed"        -> (holtWintersJob(_, _)),
    "m_trend_ols"       -> (trendOlsJob(_, _)),
    "m_inventory_sim"   -> (inventorySimJob(_, _)),
    "m_cusum"           -> (cusumJob(_, _)),
    "m_changepoint"     -> (binsegJob(_, _)),
    "m_rolling_corr"    -> (rollingCorrJob(_, _)),
    "m_theta"           -> (thetaJob(_, _)),
    "m_tsb"             -> (tsbJob(_, _)),
    "m_holt_damped"     -> (holtDampedJob(_, _)),
    "m_backtest"        -> (backtestJob(_, _))
  )

  val oracles: Map[String, String] = Map(
    "m_croston" ->
      s"""WITH RECURSIVE $gapCte,
        |series AS (
        |  SELECT profile_name, list(weight ORDER BY week_date) AS xs
        |  FROM gap GROUP BY profile_name),
        |init AS (
        |  SELECT profile_name, xs, len(xs) AS n,
        |    list_position([x > 0 for x in xs], true) AS f
        |  FROM series
        |  -- list_position returns 0 (not NULL) on no match: > 0 mirrors the
        |  -- engine's `f < 0 => skip` for an all-zero-demand profile
        |  WHERE list_position([x > 0 for x in xs], true) > 0),
        |cro AS (
        |  SELECT profile_name, xs, n, f AS i, xs[f] AS z,
        |    CAST(f AS DOUBLE) AS p, 1 AS q
        |  FROM init
        |  UNION ALL
        |  SELECT profile_name, xs, n, i + 1,
        |    CASE WHEN xs[i + 1] > 0 THEN 0.2 * xs[i + 1] + 0.8 * z ELSE z END,
        |    CASE WHEN xs[i + 1] > 0 THEN 0.2 * q + 0.8 * p ELSE p END,
        |    CASE WHEN xs[i + 1] > 0 THEN 1 ELSE q + 1 END
        |  FROM cro WHERE i < n)
        |SELECT profile_name,
        |  round(z, 6) AS demand_level,
        |  round(p, 6) AS interval_est,
        |  round(z / p, 6) AS forecast,
        |  round(0.9 * z / p, 6) AS sba_forecast
        |FROM cro WHERE i = n ORDER BY profile_name""".stripMargin,
    "m_seasonal_decomp" -> seasonalDecompSql,
    // decomp subquery + DECIMAL residual moments + sample-sigma z filter
    "e_anomalies_seasonal" ->
      s"""WITH comp AS (
        |  SELECT * FROM ($seasonalDecompSql) q WHERE trend IS NOT NULL),
        |m AS (
        |  SELECT *,
        |    COUNT(*) OVER p AS n,
        |    CAST(SUM(CAST(resid AS DECIMAL(38,18))) OVER p AS DOUBLE) AS s_r,
        |    CAST(SUM(CAST(resid * resid AS DECIMAL(38,18))) OVER p AS DOUBLE) AS s_rr
        |  FROM comp WINDOW p AS (PARTITION BY profile_name)),
        |z AS (
        |  SELECT *,
        |    (resid - s_r / n) / sqrt((s_rr - s_r * s_r / n) / (n - 1)) AS zz
        |  FROM m)
        |SELECT profile_name, week_date, weight, resid, round(zz, 6) AS z_score
        |FROM z WHERE abs(zz) > 3.0
        |ORDER BY profile_name, week_date""".stripMargin,
    // the decomp replay as a subquery, then the same DECIMAL variance
    // moments and once-rounded strength ratios
    "m_seasonality_strength" ->
      s"""WITH comp AS (
        |  SELECT * FROM ($seasonalDecompSql) q WHERE trend IS NOT NULL),
        |mo AS (
        |  SELECT profile_name, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(resid AS DECIMAL(38,18))) AS DOUBLE) AS s_r,
        |    CAST(SUM(CAST(resid * resid AS DECIMAL(38,18))) AS DOUBLE) AS s_rr,
        |    CAST(SUM(CAST((seasonal + resid) AS DECIMAL(38,18))) AS DOUBLE) AS s_sr,
        |    CAST(SUM(CAST((seasonal + resid) * (seasonal + resid) AS DECIMAL(38,18))) AS DOUBLE) AS s_srr,
        |    CAST(SUM(CAST((trend + resid) AS DECIMAL(38,18))) AS DOUBLE) AS s_tr,
        |    CAST(SUM(CAST((trend + resid) * (trend + resid) AS DECIMAL(38,18))) AS DOUBLE) AS s_trr
        |  FROM comp GROUP BY profile_name)
        |SELECT profile_name, n,
        |  round(greatest(0.0,
        |    1.0 - ((s_rr - s_r * s_r / n) / (s_srr - s_sr * s_sr / n))), 6)
        |    AS seasonal_strength,
        |  round(greatest(0.0,
        |    1.0 - ((s_rr - s_r * s_r / n) / (s_trr - s_tr * s_tr / n))), 6)
        |    AS trend_strength
        |FROM mo ORDER BY profile_name""".stripMargin,
    "m_hw_fixed" ->
      s"""WITH RECURSIVE $gapCte,
        |series AS (
        |  SELECT profile_name, list(weight ORDER BY week_date) AS xs
        |  FROM gap GROUP BY profile_name),
        |init AS (
        |  SELECT profile_name, xs, len(xs) AS n,
        |    list_reduce(xs[1:13], (a, b) -> a + b) / 13 AS m1,
        |    list_reduce(xs[14:26], (a, b) -> a + b) / 13 AS m2
        |  FROM series WHERE len(xs) >= 27),
        |hw AS (
        |  SELECT profile_name, xs, n, 13 AS i,
        |    m1 AS l, (m2 - m1) / 13 AS b,
        |    [x - m1 for x in xs[1:13]] AS slist
        |  FROM init
        |  UNION ALL
        |  SELECT profile_name, xs, n, i + 1,
        |    0.3 * (xs[i + 1] - slist[1]) + 0.7 * (l + b),
        |    0.1 * ((0.3 * (xs[i + 1] - slist[1]) + 0.7 * (l + b)) - l) + 0.9 * b,
        |    slist[2:13] || [0.2 * (xs[i + 1] - l - b) + 0.8 * slist[1]]
        |  FROM hw WHERE i < n)
        |SELECT profile_name,
        |  round(l, 6) AS level,
        |  round(b, 6) AS trend,
        |  round(slist[1], 6) AS seasonal_next,
        |  round(l + b + slist[1], 6) AS prediction
        |FROM hw WHERE i = n ORDER BY profile_name""".stripMargin,
    // whole-unit integer moments over the same 13-row frame, identical
    // IEEE correlation, NULL on flat windows
    "m_rolling_corr" ->
      s"""WITH $gapCte,
        |r AS (
        |  SELECT profile_name, week_date,
        |    CAST(round(weight) AS BIGINT) AS x
        |  FROM gap),
        |tot AS (SELECT week_date, CAST(SUM(x) AS BIGINT) AS y FROM r GROUP BY week_date),
        |m AS (
        |  SELECT r.profile_name, r.week_date,
        |    COUNT(*) OVER w AS mct,
        |    CAST(SUM(x) OVER w AS DOUBLE) AS sx,
        |    CAST(SUM(y) OVER w AS DOUBLE) AS sy,
        |    CAST(SUM(x * x) OVER w AS DOUBLE) AS sxx,
        |    CAST(SUM(y * y) OVER w AS DOUBLE) AS syy,
        |    CAST(SUM(x * y) OVER w AS DOUBLE) AS sxy
        |  FROM r JOIN tot USING (week_date)
        |  WINDOW w AS (PARTITION BY r.profile_name ORDER BY r.week_date
        |    ROWS BETWEEN ${corrWin - 1} PRECEDING AND CURRENT ROW))
        |SELECT profile_name, week_date,
        |  CASE WHEN ($corrWin.0 * sxx - sx * sx) * ($corrWin.0 * syy - sy * sy) > 0.0
        |    THEN round(($corrWin.0 * sxy - sx * sy)
        |      / sqrt(($corrWin.0 * sxx - sx * sx) * ($corrWin.0 * syy - sy * sy)), 6)
        |  END AS corr13
        |FROM m WHERE mct = $corrWin
        |ORDER BY profile_name, week_date""".stripMargin,
    // integer-prefix binseg replay: same 10⁶-scaled BIGINT weights,
    // same exact-double (Σy)²/m expression tree, raw-double argmax with
    // the t tiebreak, floor()-pinned gains — no decimals, no libm
    "m_changepoint" ->
      s"""WITH $gapCte,
        |p AS (
        |  SELECT profile_name, week_date,
        |    row_number() OVER w AS t,
        |    SUM(CAST(round(weight * 1000000.0) AS BIGINT)) OVER
        |      (PARTITION BY profile_name ORDER BY week_date ROWS UNBOUNDED PRECEDING) AS sy,
        |    COUNT(*) OVER pp AS n,
        |    SUM(CAST(round(weight * 1000000.0) AS BIGINT)) OVER pp AS ty
        |  FROM gap
        |  WINDOW w AS (PARTITION BY profile_name ORDER BY week_date),
        |    pp AS (PARTITION BY profile_name)),
        |sc AS (
        |  SELECT *,
        |    CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / t
        |      + CAST(ty - sy AS DOUBLE) * CAST(ty - sy AS DOUBLE) / (n - t) AS g
        |  FROM p WHERE t >= 2 AND t <= n - 2),
        |w1 AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER
        |      (PARTITION BY profile_name ORDER BY g DESC, t) AS rn
        |    FROM sc) x WHERE rn = 1),
        |c2 AS (
        |  SELECT p.profile_name, p.week_date, p.t,
        |    CASE
        |      WHEN p.t >= 2 AND p.t <= w1.w - 2 THEN
        |        CAST(p.sy AS DOUBLE) * CAST(p.sy AS DOUBLE) / p.t
        |          + CAST(w1.syw - p.sy AS DOUBLE) * CAST(w1.syw - p.sy AS DOUBLE) / (w1.w - p.t)
        |          - CAST(w1.syw AS DOUBLE) * CAST(w1.syw AS DOUBLE) / w1.w
        |      WHEN p.t >= w1.w + 2 AND p.t <= p.n - 2 THEN
        |        CAST(p.sy - w1.syw AS DOUBLE) * CAST(p.sy - w1.syw AS DOUBLE) / (p.t - w1.w)
        |          + CAST(p.ty - p.sy AS DOUBLE) * CAST(p.ty - p.sy AS DOUBLE) / (p.n - p.t)
        |          - CAST(p.ty - w1.syw AS DOUBLE) * CAST(p.ty - w1.syw AS DOUBLE) / (p.n - w1.w)
        |    END AS red
        |  FROM p JOIN (SELECT profile_name, t AS w, sy AS syw FROM w1) w1
        |    USING (profile_name)),
        |w2 AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER
        |      (PARTITION BY profile_name ORDER BY red DESC, t) AS rn
        |    FROM c2 WHERE red IS NOT NULL) x WHERE rn = 1)
        |SELECT w1.profile_name,
        |  CAST(w1.n AS BIGINT) AS n,
        |  w1.week_date AS cp1_week,
        |  CAST(floor((w1.g - CAST(w1.ty AS DOUBLE) * CAST(w1.ty AS DOUBLE) / w1.n) / 1e12)
        |    AS BIGINT) AS cp1_gain,
        |  w2.week_date AS cp2_week,
        |  CAST(floor(w2.red / 1e12) AS BIGINT) AS cp2_gain
        |FROM w1 LEFT JOIN w2 USING (profile_name)
        |ORDER BY w1.profile_name""".stripMargin,
    "m_cusum" ->
      s"""WITH $gapCte,
        |m AS (
        |  SELECT profile_name, week_date, weight,
        |    COUNT(*) OVER p AS n,
        |    CAST(SUM(CAST(weight AS DECIMAL(38,18))) OVER p AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(weight * weight AS DECIMAL(38,18))) OVER p AS DOUBLE) AS syy
        |  FROM gap WINDOW p AS (PARTITION BY profile_name)),
        |d AS (
        |  SELECT *,
        |    sqrt((syy - sy * sy / n) / (n - 1)) AS sigma,
        |    weight - sy / n AS dev
        |  FROM m),
        |c AS (
        |  -- round ONCE in DECIMAL (exact, ties away from zero in both
        |  -- engines) before the double cast; the flag compares the same
        |  -- once-rounded value — mirrors the engine exactly
        |  SELECT *,
        |    round(SUM(CAST(dev AS DECIMAL(38,18))) OVER
        |      (PARTITION BY profile_name ORDER BY week_date
        |       ROWS UNBOUNDED PRECEDING), 6) AS cusum_r
        |  FROM d)
        |SELECT profile_name, week_date,
        |  CAST(cusum_r AS DOUBLE) AS cusum,
        |  CAST(CAST(cusum_r AS DOUBLE) > 5.0 * sigma
        |    OR CAST(cusum_r AS DOUBLE) < -5.0 * sigma AS INT) AS drift_flag
        |FROM c ORDER BY profile_name, week_date""".stripMargin,
    // four recursion replays over the train prefix (ses/holt/damped/
    // croston, all literal coefficients), holdout actuals by 1-based
    // index, squared errors once-rounded into DECIMAL(20,9), rank on
    // the rounded mse with the method tiebreak
    "m_backtest" ->
      s"""WITH RECURSIVE $gapCte,
        |series AS (
        |  SELECT profile_name, list(weight ORDER BY week_date) AS xs
        |  FROM gap GROUP BY profile_name),
        |base AS (
        |  SELECT profile_name, xs[1:len(xs) - $backtestHoldout] AS tr, xs, len(xs) AS n
        |  FROM series WHERE len(xs) >= ${backtestHoldout + 2}),
        |ses AS (
        |  SELECT profile_name, tr, 1 AS i, tr[1] AS z FROM base
        |  UNION ALL
        |  SELECT profile_name, tr, i + 1, 0.6 * tr[i + 1] + 0.4 * z
        |  FROM ses WHERE i < len(tr)),
        |sesf AS (SELECT profile_name, z FROM ses WHERE i = len(tr)),
        |holt AS (
        |  SELECT profile_name, tr, 1 AS i, tr[1] AS l, tr[2] - tr[1] AS b FROM base
        |  UNION ALL
        |  SELECT profile_name, tr, i + 1,
        |    0.8 * tr[i + 1] + 0.2 * (l + b),
        |    0.2 * ((0.8 * tr[i + 1] + 0.2 * (l + b)) - l) + 0.8 * b
        |  FROM holt WHERE i < len(tr)),
        |holtf AS (SELECT profile_name, l, b FROM holt WHERE i = len(tr)),
        |dmp AS (
        |  SELECT profile_name, tr, 1 AS i, tr[1] AS l, tr[2] - tr[1] AS b FROM base
        |  UNION ALL
        |  SELECT profile_name, tr, i + 1,
        |    0.3 * tr[i + 1] + 0.7 * (l + 0.9 * b),
        |    0.1 * ((0.3 * tr[i + 1] + 0.7 * (l + 0.9 * b)) - l) + 0.9 * (0.9 * b)
        |  FROM dmp WHERE i < len(tr)),
        |dmpf AS (SELECT profile_name, l, b FROM dmp WHERE i = len(tr)),
        |cri AS (
        |  SELECT profile_name, tr, list_position([x > 0 for x in tr], true) AS f
        |  FROM base WHERE list_position([x > 0 for x in tr], true) > 0),
        |cro AS (
        |  SELECT profile_name, tr, f AS i, tr[f] AS z, CAST(f AS DOUBLE) AS p, 1 AS q
        |  FROM cri
        |  UNION ALL
        |  SELECT profile_name, tr, i + 1,
        |    CASE WHEN tr[i + 1] > 0 THEN 0.2 * tr[i + 1] + 0.8 * z ELSE z END,
        |    CASE WHEN tr[i + 1] > 0 THEN 0.2 * q + 0.8 * p ELSE p END,
        |    CASE WHEN tr[i + 1] > 0 THEN 1 ELSE q + 1 END
        |  FROM cro WHERE i < len(tr)),
        |crof AS (SELECT profile_name, z, p FROM cro WHERE i = len(tr)),
        |hz AS (SELECT CAST(range AS INT) AS h FROM range(1, ${backtestHoldout + 1})),
        |fc AS (
        |  SELECT b.profile_name, 'ses' AS method, hz.h, s.z AS forecast,
        |    b.xs[b.n - $backtestHoldout + hz.h] AS actual
        |  FROM base b JOIN sesf s USING (profile_name), hz
        |  UNION ALL
        |  SELECT b.profile_name, 'holt', hz.h, hf.l + hz.h * hf.b,
        |    b.xs[b.n - $backtestHoldout + hz.h]
        |  FROM base b JOIN holtf hf USING (profile_name), hz
        |  UNION ALL
        |  SELECT b.profile_name, 'damped', hz.h,
        |    df.l + CASE hz.h WHEN 1 THEN 0.9 WHEN 2 THEN 0.9 + 0.9 * 0.9
        |      WHEN 3 THEN 0.9 + 0.9 * 0.9 + 0.9 * 0.9 * 0.9
        |      WHEN 4 THEN 0.9 + 0.9 * 0.9 + 0.9 * 0.9 * 0.9 + 0.9 * 0.9 * 0.9 * 0.9
        |      ELSE 0.9 + 0.9 * 0.9 + 0.9 * 0.9 * 0.9 + 0.9 * 0.9 * 0.9 * 0.9
        |        + 0.9 * 0.9 * 0.9 * 0.9 * 0.9 END * df.b,
        |    b.xs[b.n - $backtestHoldout + hz.h]
        |  FROM base b JOIN dmpf df USING (profile_name), hz
        |  UNION ALL
        |  SELECT b.profile_name, 'croston', hz.h, c.z / c.p,
        |    b.xs[b.n - $backtestHoldout + hz.h]
        |  FROM base b JOIN crof c USING (profile_name), hz),
        |se AS (
        |  SELECT profile_name, method,
        |    CAST(round((forecast - actual) * (forecast - actual), 9)
        |      AS DECIMAL(20,9)) AS sqe
        |  FROM fc),
        |ms AS (
        |  SELECT profile_name, method, CAST(COUNT(*) AS BIGINT) AS n_h,
        |    CAST(SUM(sqe) AS DOUBLE) AS ssed
        |  FROM se GROUP BY 1, 2)
        |SELECT profile_name, method, round(ssed / n_h, 6) AS mse,
        |  CAST(row_number() OVER (PARTITION BY profile_name
        |    ORDER BY round(ssed / n_h, 6), method) AS INT) AS rank
        |FROM ms ORDER BY profile_name, rank""".stripMargin,
    // the m_holt_fixed recursion with the phi-damped trend; horizon
    // multipliers are explicit literal chains (no pow on either engine)
    "m_holt_damped" ->
      s"""WITH RECURSIVE $gapCte,
        |series AS (
        |  SELECT profile_name, list(weight ORDER BY week_date) AS xs
        |  FROM gap GROUP BY profile_name),
        |dh AS (
        |  SELECT profile_name, xs, 1 AS i, xs[1] AS l, xs[2] - xs[1] AS b
        |  FROM series WHERE len(xs) >= 2
        |  UNION ALL
        |  SELECT profile_name, xs, i + 1,
        |    0.3 * xs[i + 1] + 0.7 * (l + 0.9 * b),
        |    0.1 * ((0.3 * xs[i + 1] + 0.7 * (l + 0.9 * b)) - l) + 0.9 * (0.9 * b)
        |  FROM dh WHERE i < len(xs)),
        |fin AS (SELECT profile_name, l, b FROM dh WHERE i = len(xs))
        |SELECT profile_name, CAST(h.range AS INT) AS horizon,
        |  round(l, 6) AS level, round(b, 6) AS trend,
        |  round(l + CASE h.range WHEN 1 THEN 0.9 WHEN 2 THEN 0.9 + 0.9 * 0.9
        |    ELSE 0.9 + 0.9 * 0.9 + 0.9 * 0.9 * 0.9 END * b, 6) AS forecast
        |FROM fin, range(1, 4) h
        |ORDER BY profile_name, horizon""".stripMargin,
    // croston-shaped recursion with the TSB updates: probability smoothed
    // EVERY period (p + 0.1*(occ - p) written with literal branches),
    // size on demand periods only; seeds mirror m_croston
    "m_tsb" ->
      s"""WITH RECURSIVE $gapCte,
        |series AS (
        |  SELECT profile_name, list(weight ORDER BY week_date) AS xs
        |  FROM gap GROUP BY profile_name),
        |init AS (
        |  SELECT profile_name, xs, len(xs) AS n,
        |    list_position([x > 0 for x in xs], true) AS f
        |  FROM series
        |  WHERE list_position([x > 0 for x in xs], true) > 0),
        |tsb AS (
        |  SELECT profile_name, xs, n, f AS i, xs[f] AS z,
        |    1.0 / f AS p
        |  FROM init
        |  UNION ALL
        |  SELECT profile_name, xs, n, i + 1,
        |    CASE WHEN xs[i + 1] > 0 THEN 0.2 * xs[i + 1] + 0.8 * z ELSE z END,
        |    CASE WHEN xs[i + 1] > 0 THEN p + 0.1 * (1.0 - p)
        |         ELSE p + 0.1 * (0.0 - p) END
        |  FROM tsb WHERE i < n)
        |SELECT profile_name,
        |  round(p, 6) AS prob_demand,
        |  round(z, 6) AS demand_level,
        |  round(p * z, 6) AS forecast
        |FROM tsb WHERE i = n ORDER BY profile_name""".stripMargin,
    // OLS anchor (the m_trend_ols closed form, rounded once at 6 dp),
    // theta2 rows from the rounded anchor, SES recursion with literal
    // 0.2/0.8, horizon arithmetic — every stage the engine's exact twin
    "m_theta" ->
      s"""WITH RECURSIVE $gapCte,
        |idx AS (
        |  SELECT profile_name, weight,
        |    row_number() OVER (PARTITION BY profile_name ORDER BY week_date) AS i
        |  FROM gap),
        |mo AS (
        |  SELECT profile_name,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(i) AS BIGINT) AS sx,
        |    CAST(SUM(i * i) AS BIGINT) AS sxx,
        |    CAST(SUM(CAST(weight AS DECIMAL(38,18))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(i * weight AS DECIMAL(38,18))) AS DOUBLE) AS sxy
        |  FROM idx GROUP BY profile_name),
        |ab AS (
        |  SELECT profile_name, n,
        |    round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        |    round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) AS intercept
        |  FROM mo),
        |th AS MATERIALIZED (
        |  SELECT x.profile_name, x.i, ab.n, ab.slope, ab.intercept,
        |    2.0 * x.weight - (ab.intercept + ab.slope * x.i) AS x
        |  FROM idx x JOIN ab USING (profile_name)),
        |ses AS (
        |  SELECT profile_name, n, slope, intercept, i, x AS z
        |  FROM th WHERE i = 1
        |  UNION ALL
        |  SELECT s.profile_name, s.n, s.slope, s.intercept, t.i,
        |    0.2 * t.x + 0.8 * s.z
        |  FROM ses s JOIN th t
        |    ON t.profile_name = s.profile_name AND t.i = s.i + 1)
        |SELECT s.profile_name, CAST(h.range + 1 AS INT) AS horizon,
        |  round(s.z, 6) AS theta_level,
        |  round(s.intercept + s.slope * (s.n + h.range + 1), 6) AS trend_component,
        |  round(0.5 * (s.z + (s.intercept + s.slope * (s.n + h.range + 1))), 6) AS forecast
        |FROM ses s, range(0, $thetaHorizon) h WHERE s.i = s.n
        |ORDER BY profile_name, horizon""".stripMargin,
    "m_inventory_sim" ->
      s"""WITH RECURSIVE $gapCte,
        |series AS (
        |  SELECT profile_name, list(weight ORDER BY week_date) AS xs
        |  FROM gap GROUP BY profile_name),
        |init AS (
        |  SELECT profile_name, xs, len(xs) AS n,
        |    list_reduce(xs, (a, b) -> a + b) AS tot,
        |    list_reduce(xs, (a, b) -> a + b) / len(xs) AS m
        |  FROM series),
        |inv AS (
        |  SELECT profile_name, xs, n, tot, m, 0 AS i,
        |    4.0 * m AS stock, 0 AS pending, CAST(0.0 AS DOUBLE) AS lost, 0 AS orders
        |  FROM init
        |  UNION ALL
        |  SELECT profile_name, xs, n, tot, m, i + 1,
        |    greatest((stock + CASE WHEN pending = 1 THEN 4.0 * m ELSE 0.0 END) - xs[i + 1], 0.0),
        |    CASE WHEN greatest((stock + CASE WHEN pending = 1 THEN 4.0 * m ELSE 0.0 END) - xs[i + 1], 0.0)
        |              < 2.0 * m THEN 1 ELSE 0 END,
        |    lost + greatest(xs[i + 1] - (stock + CASE WHEN pending = 1 THEN 4.0 * m ELSE 0.0 END), 0.0),
        |    orders + CASE WHEN greatest((stock + CASE WHEN pending = 1 THEN 4.0 * m ELSE 0.0 END) - xs[i + 1], 0.0)
        |                       < 2.0 * m THEN 1 ELSE 0 END
        |  FROM inv WHERE i < n)
        |SELECT profile_name,
        |  round(stock, 6) AS final_stock,
        |  round(lost, 6) AS lost_sales,
        |  CAST(orders AS INT) AS n_orders,
        |  round((tot - lost) / tot, 6) AS service_rate
        |FROM inv WHERE i = n ORDER BY profile_name""".stripMargin,
    "m_trend_ols" ->
      s"""WITH $gapCte,
        |idx AS (
        |  SELECT profile_name, weight,
        |    row_number() OVER (PARTITION BY profile_name ORDER BY week_date) AS i
        |  FROM gap),
        |mo AS (
        |  SELECT profile_name,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(i) AS BIGINT) AS sx,
        |    CAST(SUM(i * i) AS BIGINT) AS sxx,
        |    CAST(SUM(CAST(weight AS DECIMAL(38,18))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(i * weight AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(weight * weight AS DECIMAL(38,18))) AS DOUBLE) AS syy
        |  FROM idx GROUP BY profile_name)
        |SELECT profile_name,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) AS intercept,
        |  round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
        |        ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
        |FROM mo ORDER BY profile_name""".stripMargin,
    "m_acf" -> acfSql,
    // normal-equation replay: the 20 DECIMAL moments, a 4-round
    // recursive-CTE Gaussian elimination over the augmented matrix
    // (full-row updates, no pivoting — mirrors the engine loop), then
    // unrolled ascending-j back-substitution via lateral aliases
    "m_ols_multi" -> olsMultiSql,
    // the Q assembly over the ACF subquery: rounded ρ̂ in, DECIMAL term
    // sum, once-rounded Q, flag off the rounded value (m_cusum rule)
    "m_ljung_box" ->
      // the outer spine CTE is renamed gap_lb: acfSql nests its own
      // `gap`, and DuckDB rejects shadowing between a MATERIALIZED CTE
      // and a same-named nested one (fine for plain CTEs)
      s"""WITH ${gapCte.replace("gap AS MATERIALIZED", "gap_lb AS MATERIALIZED")},
        |cnt AS (SELECT profile_name, CAST(COUNT(*) AS BIGINT) AS n
        |        FROM gap_lb GROUP BY profile_name),
        |a AS (SELECT * FROM ($acfSql) x),
        |t AS (
        |  SELECT a.profile_name, n,
        |    CAST(SUM(CAST(acf * acf / (n - lag) AS DECIMAL(38,18))) AS DOUBLE) AS ssum
        |  FROM a JOIN cnt ON a.profile_name = cnt.profile_name
        |  GROUP BY a.profile_name, n),
        |q AS (
        |  SELECT profile_name, n,
        |    round(CAST(n * (n + 2) AS DOUBLE) * ssum, 6) AS q_stat
        |  FROM t)
        |SELECT profile_name, n, q_stat, q_stat > 12.591587 AS lb_reject
        |FROM q ORDER BY profile_name""".stripMargin,
    // Durbin–Levinson replay over the ACF subquery: the recursion
    // carries the φ row as a LIST (the Holt-Winters seasonal-state
    // precedent); α's inner Σ subtracts in ascending j via the
    // prepended-init ordered fold, exactly the engine's loop order
    "m_pacf" -> {
      // α at state k (producing lag k+1) — repeated verbatim wherever
      // the step needs it, so every occurrence is the same expression
      val alpha =
        "(list_reduce(list_prepend(r[k + 1], [CAST(x AS DOUBLE) for x in range(1, k + 1)]), " +
          "(acc, t) -> acc - phl[CAST(t AS INT)] * r[k + 1 - CAST(t AS INT)]) / v)"
      s"""WITH RECURSIVE rl AS (
        |  SELECT profile_name, list(acf ORDER BY lag) AS r
        |  FROM ($acfSql) a GROUP BY profile_name),
        |dl AS (
        |  SELECT profile_name, r, 1 AS k,
        |    [r[1]] AS phl,
        |    1.0 - r[1] * r[1] AS v,
        |    [r[1]] AS pac
        |  FROM rl
        |  UNION ALL
        |  SELECT profile_name, r, k + 1,
        |    [phl[CAST(j AS INT)] - $alpha * phl[k + 1 - CAST(j AS INT)]
        |       for j in range(1, k + 1)] || [$alpha],
        |    v * (1.0 - $alpha * $alpha),
        |    pac || [$alpha]
        |  FROM dl WHERE k < len(r))
        |SELECT profile_name, CAST(o AS INT) AS lag, round(p, 6) AS pacf
        |FROM (
        |  SELECT profile_name, unnest(pac) AS p, generate_subscripts(pac, 1) AS o
        |  FROM dl WHERE k = len(r)) t
        |ORDER BY profile_name, lag""".stripMargin
    }
  )

  /** The m_ols_multi replay (generated, like [[acfSql]], so the 20
    * moment sums stay typo-free).
    */
  private lazy val olsMultiSql: String = {
    val fx = Seq("1.0", "t", "d1", "d2", "d3")
    val xtxSums = (for { k <- 0 until 5; l <- k until 5 } yield
      s"CAST(SUM(CAST(${fx(k)} * ${fx(l)} AS DECIMAL(38,18))) AS DOUBLE) AS s$k$l").mkString(",\n        |    ")
    val xtySums = (0 until 5)
      .map(k => s"CAST(SUM(CAST(${fx(k)} * y AS DECIMAL(38,18))) AS DOUBLE) AS sy$k")
      .mkString(",\n        |    ")
    // symmetric augmented 5×6 matrix from the upper-triangle names
    def m(i: Int, j: Int) = if (j == 5) s"sy$i" else if (i <= j) s"s$i$j" else s"s$j$i"
    val aug = (0 until 5)
      .map(i => "[" + (0 to 5).map(j => m(i, j)).mkString(", ") + "]")
      .mkString("[", ", ", "]")
    val elimRow =
      "[mm[CAST(i AS INT)][CAST(j AS INT)] - " +
        "(mm[CAST(i AS INT)][k + 1] / mm[k + 1][k + 1]) * mm[k + 1][CAST(j AS INT)] " +
        "for j in range(1, 7)]"
    val backSub = Seq(
      "mm[5][6] / mm[5][5] AS b5",
      "(mm[4][6] - mm[4][5] * b5) / mm[4][4] AS b4",
      "(mm[3][6] - mm[3][4] * b4 - mm[3][5] * b5) / mm[3][3] AS b3",
      "(mm[2][6] - mm[2][3] * b3 - mm[2][4] * b4 - mm[2][5] * b5) / mm[2][2] AS b2",
      "(mm[1][6] - mm[1][2] * b2 - mm[1][3] * b3 - mm[1][4] * b4 - mm[1][5] * b5) / mm[1][1] AS b1"
    ).mkString(",\n        |    ")
    s"""WITH RECURSIVE $gapCte,
      |f AS (
      |  SELECT profile_name, weight AS y,
      |    CAST(row_number() OVER (PARTITION BY profile_name ORDER BY week_date) AS DOUBLE) AS t
      |  FROM gap),
      |f2 AS (
      |  SELECT profile_name, y, t,
      |    CASE WHEN CAST(t - 1 AS BIGINT) % 4 = 1 THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS d1,
      |    CASE WHEN CAST(t - 1 AS BIGINT) % 4 = 2 THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS d2,
      |    CASE WHEN CAST(t - 1 AS BIGINT) % 4 = 3 THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS d3
      |  FROM f),
      |su AS (
      |  SELECT profile_name,
      |    $xtxSums,
      |    $xtySums,
      |    CAST(SUM(CAST(y * y AS DECIMAL(38,18))) AS DOUBLE) AS syy
      |  FROM f2 GROUP BY profile_name),
      |el AS (
      |  SELECT profile_name, 0 AS k, $aug AS mm FROM su
      |  UNION ALL
      |  SELECT profile_name, k + 1,
      |    [CASE WHEN i <= k + 1 THEN mm[CAST(i AS INT)] ELSE $elimRow END
      |       for i in range(1, 6)]
      |  FROM el WHERE k < 4),
      |bt AS (
      |  SELECT profile_name,
      |    $backSub
      |  FROM el WHERE k = 4)
      |SELECT b.profile_name,
      |  round(b1, 6) AS b_intercept,
      |  round(b2, 6) AS b_trend,
      |  round(b3, 6) AS b_phase1,
      |  round(b4, 6) AS b_phase2,
      |  round(b5, 6) AS b_phase3,
      |  round(1.0 - (syy - (b1 * sy0 + b2 * sy1 + b3 * sy2 + b4 * sy3 + b5 * sy4))
      |    / (syy - sy0 * sy0 / s00), 6) AS r2
      |FROM bt b JOIN su USING (profile_name)
      |ORDER BY profile_name""".stripMargin
  }

  /** The m_acf replay, extracted so m_pacf can wrap it as a subquery. */
  private lazy val acfSql: String = {
    val leads = (1 to acfMaxLag)
      .map(k => s"lead(dev, $k) OVER w AS d$k")
      .mkString(",\n        |    ")
    val csums = (1 to acfMaxLag)
      .map(k => s"CAST(SUM(CAST(dev * d$k AS DECIMAL(38,18))) AS DOUBLE) AS c$k")
      .mkString(",\n        |    ")
    val branches = (1 to acfMaxLag)
      .map(k => s"SELECT profile_name, $k AS lag, round(c$k / c0, 6) AS acf FROM c")
      .mkString("\n        |  UNION ALL ")
    s"""WITH $gapCte,
      |m AS (
      |  SELECT profile_name, week_date, weight,
      |    weight - CAST(SUM(CAST(weight AS DECIMAL(38,18))) OVER p AS DOUBLE)
      |             / COUNT(*) OVER p AS dev
      |  FROM gap WINDOW p AS (PARTITION BY profile_name)),
      |l AS (
      |  SELECT profile_name, dev,
      |    $leads
      |  FROM m WINDOW w AS (PARTITION BY profile_name ORDER BY week_date)),
      |c AS (
      |  SELECT profile_name,
      |    CAST(SUM(CAST(dev * dev AS DECIMAL(38,18))) AS DOUBLE) AS c0,
      |    $csums
      |  FROM l GROUP BY profile_name)
      |SELECT * FROM (
      |  $branches)
      |ORDER BY profile_name, lag""".stripMargin
  }
}
