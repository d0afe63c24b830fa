package graft.forecast

import graft.SparkSpec

/** Theta combination invariants on the emitted rows: the forecast is the
  * midpoint of the two theta lines (within the 6-dp rounding budget), the
  * SES level is constant across horizons, and the trend component moves
  * linearly in the horizon.
  */
class ThetaSpec extends SparkSpec {

  test("midpoint, flat level and linear trend across horizons") {
    val rows = SeriesAnalysis.thetaJob(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lvl, tr, f) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(math.abs(f - 0.5 * (lvl + tr)) < 2e-6, s"midpoint broken: $lvl $tr $f")
    }
    rows.groupBy(_.getString(0)).foreach { case (p, rs) =>
      val byH = rs.sortBy(_.getInt(1))
      assert(byH.map(_.getDouble(2)).distinct.length == 1, s"$p: SES level not flat")
      val steps = byH.sliding(2).map(w => w(1).getDouble(3) - w(0).getDouble(3)).toSeq
      assert(steps.forall(s => math.abs(s - steps.head) < 2e-6), s"$p: trend not linear: $steps")
    }
  }
}
