package graft.queries

import graft.SparkSpec

class AdvancedSpec extends SparkSpec {

  test("approx distinct within 5% of exact") {
    Advanced.aApproxDistinct(spark, sf0001).collect().foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact  = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05, s"approx=$approx exact=$exact")
    }
  }

  test("sessionize: session bounds ordered, events conserved") {
    val rows = Advanced.wSessionize(spark, sf0001).collect()
    assert(rows.map(_.getLong(4)).sum == 1000) // all events assigned
    rows.foreach { r =>
      assert(!r.getTimestamp(2).after(r.getTimestamp(3))) // start <= end
    }
    // session ids are 1..n per user
    rows.groupBy(_.getLong(0)).values.foreach { ss =>
      val ids = ss.map(_.getLong(1)).sorted
      assert(ids.toSeq == (1L to ids.length))
    }
  }
}
