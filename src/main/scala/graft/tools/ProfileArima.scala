package graft.tools

import graft.GraftSession

/** Phase breakdown of m_arima_forecast (scratch profiling main). */
object ProfileArima {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "profile-arima")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[arima] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (round <- 1 to 2) {
      println(s"[arima] -- round $round --")
      time("full m_arima_forecast")(graft.forecast.ForecastJobs.arimaJob(spark, d).collect())
      import spark.implicits._
      val sds = graft.forecast.ForecastJobs.typedWeekly(spark, d, minWeeks = 5)
        .groupByKey(_.profile_name)
        .mapGroups((k, rows) => (k, rows.toArray.sortBy(_.week_date.toString).map(_.weight)))
      time("phase: seriesDs count")(sds.count())
      val scored = graft.forecast.ForecastJobs.gridScored(spark, sds)
      time("phase: gridScored count")(scored.count())
      val best = graft.forecast.ForecastJobs.gridBest(spark, scored)
      time("phase: gridBest count")(best.count())
      time("phase: full minus input (scored cached)")({
        val sc = scored.persist()
        sc.count()
        val t0 = System.nanoTime()
        val b2 = graft.forecast.ForecastJobs.gridBest(spark, sc)
        import spark.implicits._
        val out = b2.map { case (_, t) =>
          graft.forecast.Models.arimaFitMle(t.xs, t.p, t.d, t.q).map(_.forecast).getOrElse(Double.NaN)
        }.collect()
        println(f"[arima]   tail (best+mle) on cached scored: ${(System.nanoTime() - t0) / 1e9}%.2f s, ${out.length} profiles")
        sc.unpersist()
      })
      // driver-side replication of ONE profile's pipeline to split cost:
      val series = time("weekly series collect")(
        graft.forecast.ForecastJobs.queries("m_weekly_series")(spark, d)
          .collect().toSeq.groupBy(_.getString(0))
          .map { case (k, rows) =>
            k -> rows.sortBy(_.get(1).toString).map(r => r.getDouble(2)).toArray
          }
          .filter(_._2.length >= 5))
      println(s"[arima] profiles=${series.size} lens=${series.values.map(_.length).toSeq.sorted.mkString(",")}")
      val t0 = System.nanoTime()
      var cells = 0
      series.foreach { case (_, xs) =>
        for { p <- 0 until 5; dd <- 0 until 2; q <- 0 until 5 } {
          scala.util.Try(graft.forecast.Models.arimaWalkForward(xs, p, dd, q)); cells += 1
        }
      }
      println(f"[arima] single-thread grid ($cells cells): ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val t1 = System.nanoTime()
      val mleTimes = series.toSeq.map { case (k, xs) =>
        val best = graft.forecast.Models.arimaGridSearch(xs)
        val tm = System.nanoTime()
        best.foreach { case (p, dd, q, _) => graft.forecast.Models.arimaFitMle(xs, p, dd, q) }
        (k, best.map(b => (b._1, b._2, b._3)).getOrElse((-1, -1, -1)), (System.nanoTime() - tm) / 1e9)
      }
      println(f"[arima] single-thread grid+MLE: ${(System.nanoTime() - t1) / 1e9}%.2f s")
      mleTimes.sortBy(-_._3).take(6).foreach { case (k, cfg, tmle) =>
        println(f"[arima]   mle $k cfg=$cfg: $tmle%.2f s")
      }
    }
    spark.stop()
  }
}
