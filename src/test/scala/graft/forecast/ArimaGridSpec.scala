package graft.forecast

import graft.SparkSpec

/** The grid-selection and HR-fit driver rows (`m_arima_grid`,
  * `m_arima_hr`) against their sequential reference implementations: the
  * distributed (profile × config) scoring + deterministic reduce must
  * pick exactly what [[Models.arimaGridSearch]] picks profile-by-profile,
  * and the HR-fit rows must equal direct [[Models.arimaFit]] calls —
  * the same arithmetic the DuckDB oracle replays bit-exactly.
  */
class ArimaGridSpec extends SparkSpec {

  test("m_arima_grid equals sequential arimaGridSearch per profile") {
    import spark.implicits._
    val got = ForecastJobs
      .arimaGridJob(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    assert(got.nonEmpty)
    // rebuild the bounded series exactly as the job does
    val weekly = ForecastJobs
      .queries("m_weekly_series")(spark, sf0001)
      .filter($"profile_name" < "Brand#14")
      .collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) =>
        k -> rows.sortBy(_.getDate(1).toString).map(_.getDouble(2)).take(60)
      }
    // minWeeks differs (5 vs 10) but the bounded profiles have hundreds of
    // weeks at every SF, so the gate never bites; assert that holds here
    assert(weekly.values.forall(_.length >= 10))
    weekly.foreach { case (profile, xs) =>
      val Some((p, d, q, m)) = Models.arimaGridSearch(xs)
      val (cfg, mse) = got(profile)
      assert(cfg == s"($p, $d, $q)", s"$profile: $cfg != ($p, $d, $q)")
      assert(math.abs(mse - BigDecimal(m).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
  }

  test("m_arima_hr rows equal direct arimaFit calls") {
    val got = ForecastJobs
      .arimaHrJob(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.size % 3 == 0 && got.nonEmpty)
    val series = ForecastJobs
      .queries("m_weekly_series")(spark, sf0001)
      .collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) => k -> rows.sortBy(_.getDate(1).toString).map(_.getDouble(2)) }
      .filter(_._2.length > 10)
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for ((profile, xs) <- series; (p, d, q) <- Seq((2, 1, 0), (0, 1, 2), (2, 1, 2))) {
      val fit = Models.arimaFit(xs, p, d, q).get
      val (c, s2, fc) = got((profile, s"arima($p,$d,$q)"))
      assert(c == r6(fit.c) && s2 == r6(fit.sigma2) && fc == r6(fit.forecast),
        s"$profile arima($p,$d,$q)")
    }
  }

  test("grid tie-break is lexicographic on (mse, p, d, q)") {
    // two configs with identical MSE must resolve to the smaller tuple —
    // exercised via arimaGridSearch's first-strictly-smaller semantics on
    // a constant series where every fitting config yields MSE 0
    val xs = Array.fill(40)(7.0)
    val Some((p, d, q, m)) = Models.arimaGridSearch(xs)
    assert(m == 0.0 && (p, d, q) == (0, 0, 0))
  }
}
