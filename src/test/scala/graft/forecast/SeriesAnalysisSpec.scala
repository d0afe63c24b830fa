package graft.forecast

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SeriesAnalysisSpec extends SparkSpec {

  test("croston: forecast is the level/interval ratio and SBA shrinks it") {
    val rows = SeriesAnalysis.crostonJob(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val z  = r.getDouble(1); val p = r.getDouble(2)
      val f  = r.getDouble(3); val sba = r.getDouble(4)
      assert(p >= 1.0, s"interval below 1: $p")
      assert(z > 0.0, s"non-positive demand level: $z")
      // all four columns are independently rounded to 6 dp, so the ratio
      // check only holds to a relative tolerance scaled by the magnitude
      assert(math.abs(f - z / p) < 1e-4 * math.max(1.0, f), s"forecast != z/p: $f vs ${z / p}")
      assert(sba < f, s"SBA must shrink the Croston forecast: $sba !< $f")
    }
  }

  test("croston on a hand-built intermittent series matches the recursion") {
    // xs = [0, 4, 0, 0, 6]: seed at t=2 (z=4, p=2); one update at t=5 with
    // q=3: z = .2*6+.8*4 = 4.4, p = .2*3+.8*2 = 2.2
    val xs = Array(0.0, 4.0, 0.0, 0.0, 6.0)
    val f  = xs.indexWhere(_ > 0)
    var z  = xs(f); var p = (f + 1).toDouble; var q = 1
    (f + 1 until xs.length).foreach { i =>
      if (xs(i) > 0) { z = 0.2 * xs(i) + 0.8 * z; p = 0.2 * q + 0.8 * p; q = 1 }
      else q += 1
    }
    assert(math.abs(z - 4.4) < 1e-12 && math.abs(p - 2.2) < 1e-12)
  }

  test("seasonal decomposition: components reassemble the series where defined") {
    val df = SeriesAnalysis.seasonalDecompJob(spark, sf0001)
    val bad = df
      .filter(col("trend").isNotNull && col("seasonal").isNotNull)
      .filter(abs(col("weight") - (col("trend") + col("seasonal") + col("resid"))) > lit(1e-5))
      .count()
    assert(bad == 0, s"$bad rows where trend+seasonal+resid != weight")
    // seasonal means are centered: per profile the 13 phase effects sum ~0
    val off = df
      .filter(col("seasonal").isNotNull)
      .select(col("profile_name"), col("seasonal")).distinct()
      .groupBy(col("profile_name")).agg(sum(col("seasonal")).as("s"))
      .filter(abs(col("s")) > lit(1e-4))
      .count()
    assert(off == 0, s"$off profiles with un-centered seasonal effects")
  }

  test("holt-winters: prediction decomposes into level + trend + seasonal") {
    val rows = SeriesAnalysis.holtWintersJob(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (l, b, sn, p) = (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      // components independently rounded to 6 dp → tolerance, not equality
      assert(math.abs(p - (l + b + sn)) < 1e-4 * math.max(1.0, math.abs(p)),
        s"prediction != l+b+s: $p vs ${l + b + sn}")
    }
  }

  test("trend OLS: r2 is a bounded fraction, slope and intercept are finite") {
    val df = SeriesAnalysis.trendOlsJob(spark, sf0001)
    df.collect().foreach { r =>
      val r2 = r.getDouble(3)
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9, s"r2 out of range: $r2")
      assert(!r.getDouble(1).isNaN && !r.getDouble(2).isNaN)
    }
  }

  test("inventory sim: rates bounded, stock non-negative, hand case replays") {
    SeriesAnalysis.inventorySimJob(spark, sf0001).collect().foreach { r =>
      assert(r.getDouble(1) >= 0.0 && r.getDouble(2) >= 0.0)
      val sr = r.getDouble(4)
      assert(sr >= 0.0 && sr <= 1.0, s"service rate out of range: $sr")
    }
    // xs=[10,10,10]: S0=40,R=20,Q=40 → stocks 30,20,10; one order placed
    // at t3 (10 < 20), nothing lost
    val xs = Array(10.0, 10.0, 10.0)
    val m  = xs.sum / xs.length
    var stock = 4.0 * m; var pending = false; var lost = 0.0; var orders = 0
    xs.foreach { x =>
      val avail = stock + (if (pending) 4.0 * m else 0.0)
      stock = math.max(avail - x, 0.0); lost += math.max(x - avail, 0.0)
      pending = stock < 2.0 * m; if (pending) orders += 1
    }
    assert(stock == 10.0 && lost == 0.0 && orders == 1)
  }

  test("cusum: deviations telescope — the final cumulative sum is ~0") {
    // sum of (x_t - mean) over the whole series is exactly the telescoped
    // residual of the mean division; per profile the LAST cusum must be
    // numerically tiny relative to the series scale
    val df = SeriesAnalysis.cusumJob(spark, sf0001)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("profile_name")).orderBy(col("week_date").desc)
    val finals = df
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cusum")).collect().map(_.getDouble(0))
    assert(finals.nonEmpty)
    finals.foreach(c => assert(math.abs(c) < 1e-3, s"final cusum not ~0: $c"))
  }

  test("acf: lag range is 1..6 and values are bounded correlations") {
    val rows = SeriesAnalysis.acfJob(spark, sf0001).collect()
    assert(rows.map(_.getInt(1)).distinct.sorted.toSeq == (1 to SeriesAnalysis.acfMaxLag))
    rows.filterNot(_.isNullAt(2)).foreach { r =>
      val a = r.getDouble(2)
      assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9, s"acf out of range: $a")
    }
  }

  test("reconciliation: shares partition unity, td sums to top, bu sums the bases") {
    // the hygiene assertion below is about THIS job's persists; start from
    // a clean cache so earlier suite members' state can't leak into it
    spark.catalog.clearCache()
    val rows = ForecastJobs.reconcileJob(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val shareSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
    val topPred = rows.head.getDouble(5)
    assert(rows.forall(r => r.getDouble(5) == topPred)) // one top forecast
    val tdSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(tdSum - topPred) < 1e-3 * math.max(1.0, math.abs(topPred)),
      s"top-down split does not re-sum to the top forecast: $tdSum vs $topPred")
    val buTotal = rows.head.getDouble(4)
    val baseSum = rows.map(_.getDouble(1)).sum
    assert(math.abs(buTotal - baseSum) < 1e-4 * math.max(1.0, math.abs(buTotal)),
      s"bottom-up total != sum of base forecasts: $buTotal vs $baseSum")
    // cache hygiene: the weekly rollup persist must be released
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("rolling corr: values bounded in [-1, 1], full windows only") {
    val rows = SeriesAnalysis.rollingCorrJob(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.filterNot(_.isNullAt(2)).foreach { r =>
      val c = r.getDouble(2)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"corr out of range: $c")
    }
    // every emitted row had a full 13-week window: per profile the row
    // count is (weeks − 12)
    val weeks = ForecastJobs.gapfillJob(spark, sf0001)
      .groupBy(col("profile_name")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getString(0)).foreach { case (p, g) =>
      assert(g.length == weeks(p) - (SeriesAnalysis.corrWin - 1), s"$p: ${g.length}")
    }
  }

  test("conformal: interval brackets the point and q-hat covers ≥90% of calibration scores") {
    val rows = ForecastJobs.conformalJob(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (m, point, qhat, lo, hi) =
        (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(qhat >= 0.0 && lo <= point && point <= hi)
      // rank rule: k = ⌈0.9(m+1)⌉ scores sit at or below q-hat, so
      // calibration coverage is at least k/m > 0.9
      val k = math.ceil(0.9 * (m + 1)).toInt
      assert(math.min(k, m).toDouble / m >= 0.9, s"m=$m k=$k")
    }
  }

  test("mase: ratio reproduces from its own numerator/denominator") {
    val rows = ForecastJobs.maseJob(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(4)) {
        val (mm, mn, ms) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
        assert(ms == mm / mn, s"mase $ms != $mm/$mn")
        assert(mn > 0.0)
      }
    }
  }

  test("binseg: planted two-step series localizes both changepoints; flat series gains zero") {
    import spark.implicits._
    val d0 = java.time.LocalDate.of(2024, 1, 1)
    def wk(i: Int) = java.sql.Date.valueOf(d0.plusWeeks(i.toLong))
    // step profile: 30 weeks at 10, 30 at 50 (cp at week 30), 30 at 20
    // (cp at week 60); binseg must find the LARGER jump first
    val step = (0 until 90).map { i =>
      val v = if (i < 30) 10.0 else if (i < 60) 50.0 else 20.0
      ("step", wk(i), v)
    }
    val flat = (0 until 90).map(i => ("flat", wk(i), 7.5))
    val gap = (step ++ flat).toDF("profile_name", "week_date", "weight")
    val out = SeriesAnalysis.binsegCore(gap).collect()
      .map(r => r.getString(0) -> r).toMap
    val st = out("step")
    // the reported week is the LAST week of the left segment (split
    // between wk(29) and wk(30) / wk(59) and wk(60))
    assert(st.getDate(2) == wk(29), s"cp1 at ${st.getDate(2)}, want ${wk(29)}")
    assert(st.getDate(4) == wk(59), s"cp2 at ${st.getDate(4)}, want ${wk(59)}")
    assert(st.getLong(3) > 0 && st.getLong(5) > 0, "planted steps must carry positive gain")
    val fl = out("flat")
    assert(fl.getLong(3) == 0, s"flat cp1 gain ${fl.getLong(3)} != 0")
    assert(fl.getLong(5) == 0, s"flat cp2 gain ${fl.getLong(5)} != 0")
    // flat ties break to the earliest admissible split on both levels
    assert(fl.getDate(2) == wk(1), s"flat cp1 tie not earliest: ${fl.getDate(2)}")
  }
}
