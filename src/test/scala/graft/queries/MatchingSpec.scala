package graft.queries

import graft.SparkSpec

class MatchingSpec extends SparkSpec {

  test("skyline equals driver-side brute force and is dominance-free") {
    val pts = graft.tables.Tables
      .part(spark, sf0001)
      .select("p_partkey", "p_retailprice", "p_size")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val brute = pts.filter { p =>
      !pts.exists(q =>
        q._2 >= p._2 && q._3 <= p._3 && (q._2 > p._2 || q._3 < p._3))
    }.map(_._1).sorted.toSeq
    val got = Matching.aSkyline(spark, sf0001).collect().map(_.getLong(0)).toSeq
    assert(got == brute)
    assert(got.nonEmpty && got.length < pts.length)
  }

  test("fuzzy match equals blocked brute force; blocking miss is bounded to cross-block pairs") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(
          math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        )
      dp(a.length)(b.length)
    }
    val names = graft.tables.Tables
      .part(spark, sf0001)
      .select("p_name")
      .distinct()
      .collect()
      .map(_.getString(0))
      .sorted
    val blocked = (for {
      a <- names; b <- names
      if a < b && a.split(' ').last == b.split(' ').last
      d = lev(a, b) if d >= 1 && d <= 2
    } yield (a, b, d)).toSet
    val got = Matching
      .jFuzzyMatch(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet
    assert(got == blocked)
    assert(got.nonEmpty)
    // every surfaced pair's miss-risk is only cross-block: any same-block
    // close pair IS surfaced (completeness within the blocking key)
    got.foreach { case (a, b, dist) =>
      assert(a.split(' ').last == b.split(' ').last && dist >= 1 && dist <= 2)
    }
  }

  test("cohort LTV conserves revenue and accumulates monotonically") {
    val rows = Matching.eCohortLtv(spark, sf0001).collect()
    // final cumulative per cohort == sum of that cohort's revenue
    rows.groupBy(_.getDate(0)).values.foreach { cs =>
      val sorted = cs.sortBy(_.getInt(1))
      val total  = sorted.map(_.getDouble(3)).sum
      assert(math.abs(sorted.last.getDouble(4) - total) < 1e-6)
      // cum_revenue non-decreasing (revenue >= 0)
      sorted.map(_.getDouble(4)).toSeq.sliding(2).foreach {
        case Seq(x, y) => assert(y >= x)
        case _         =>
      }
      assert(sorted.head.getInt(1) == 0) // cohort month itself is age 0
    }
    // global conservation vs the orders table
    val totalOrders = graft.tables.Tables
      .orders(spark, sf0001)
      .select(
        org.apache.spark.sql.functions
          .sum(org.apache.spark.sql.functions.col("o_totalprice").cast("decimal(18,2)"))
          .cast("double"))
      .collect()(0)
      .getDouble(0)
    assert(math.abs(rows.map(_.getDouble(3)).sum - totalOrders) < 1e-4)
  }

  test("MAD anomalies: flags agree with scores; median is robust to the flagged days") {
    val rows = Matching.eAnomaliesMad(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val score = if (r.isNullAt(5)) None else Some(r.getDouble(5))
      val flag  = r.getInt(6)
      assert(flag == (if (score.exists(_ > 2.0)) 1 else 0))
      score.foreach(sc => assert(sc >= 0))
    }
    // med really is the exact median of the daily values per type
    rows.groupBy(_.getString(0)).values.foreach { ts =>
      val vs  = ts.map(_.getDouble(2)).sorted
      val n   = vs.length
      val med =
        if (n % 2 == 1) vs(n / 2)
        else { val lo = vs(n / 2 - 1); val hi = vs(n / 2); lo + (hi - lo) * 0.5 }
      assert(math.abs(ts.head.getDouble(3) - med) < 1e-5)
    }
  }

  test("Welch t-test matches a driver-side recompute from raw values") {
    val raw = graft.tables.Tables
      .events(spark, sf0001)
      .select("event_type", "event_id", "value")
      .collect()
      .map(r => (r.getString(0), r.getLong(1) % 2 == 0, r.getDouble(2)))
    val got = Matching.eAbTest(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val tpe   = r.getString(0)
      val a     = raw.filter(x => x._1 == tpe && x._2).map(_._3)
      val b     = raw.filter(x => x._1 == tpe && !x._2).map(_._3)
      def mean(v: Array[Double]) = v.sum / v.length
      def vvar(v: Array[Double]) = {
        val m = mean(v); v.map(x => (x - m) * (x - m)).sum / (v.length - 1)
      }
      assert(r.getLong(1) == a.length && r.getLong(2) == b.length)
      val se2 = vvar(a) / a.length + vvar(b) / b.length
      val t   = (mean(a) - mean(b)) / math.sqrt(se2)
      val df  = se2 * se2 / (math.pow(vvar(a) / a.length, 2) / (a.length - 1) +
        math.pow(vvar(b) / b.length, 2) / (b.length - 1))
      assert(math.abs(r.getDouble(5) - t) < 1e-4, s"$tpe t: ${r.getDouble(5)} vs $t")
      assert(math.abs(r.getDouble(6) - df) < 1e-2 * df, s"$tpe df: ${r.getDouble(6)} vs $df")
      // Welch df is bracketed by min(n)-1 and n_a+n_b-2
      assert(df >= math.min(a.length, b.length) - 1 && df <= a.length + b.length - 2)
    }
  }
}
