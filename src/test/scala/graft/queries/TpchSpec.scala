package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Plan + invariant gates for the TPC-H completion module. Hash
  * correctness is the driver's DuckDB gate (all 18 verified exact at
  * sf0.001/0.01/0.1); these tests pin the SCALE properties of the plans
  * — the semi/anti join shapes actually planned as semi/anti (not
  * materialized subqueries), dimensions broadcast, disjunctive
  * predicates riding the equi-join — plus a few semantic invariants the
  * differential gate can't express (shares bounded, thresholds honored).
  */
class TpchSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q4: EXISTS plans as a LEFT SEMI join with the cross-side range conjunct") {
    val p = plan(Tpch.q4OrderPriority(spark, sf0001))
    assert(p.contains("LeftSemi"), p)
  }

  test("q16/q22: NOT IN / NOT EXISTS plan as anti joins, not subquery rescans") {
    assert(plan(Tpch.q16SupplierVariety(spark, sf0001)).contains("LeftAnti"))
    assert(plan(Tpch.q22IdleCustomers(spark, sf0001)).contains("LeftAnti"))
  }

  test("q19: disjunctive predicate rides one broadcast equi-join (no cartesian)") {
    val p = plan(Tpch.q19Disjunctive(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q9: dimension sides broadcast; the only exchanges are orderkey join + final agg") {
    val p = plan(Tpch.q9ProductProfit(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q12: ship-date window is pushed to the lineitem scan") {
    val p = plan(Tpch.q12ShipClass(spark, sf0001))
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), s"ship window not pushed:\n$p")
  }

  test("q8: market share is a true fraction of the total") {
    val rows = Tpch.q8MarketShare(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Double]("mkt_share")
      assert(s >= 0.0 && s <= 1.0, s"share out of range: $s")
    }
  }

  test("q18: every reported order clears the 300-unit threshold") {
    val rows = Tpch.q18LargeOrders(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("total_qty") > 300.0))
  }

  test("q2: each part's reported suppliers all sit at that part's minimum balance") {
    val rows = Tpch.q2MinAcctSupp(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byPart = rows.groupBy(_.getAs[Long]("p_partkey"))
    byPart.values.foreach { g =>
      assert(g.map(_.getAs[Double]("s_acctbal")).distinct.size == 1)
    }
  }

  test("q13: distribution counts every customer exactly once") {
    val rows  = Tpch.q13OrderCountDist(spark, sf0001).collect()
    val total = rows.map(_.getAs[Long]("custdist")).sum
    val nCust = graft.tables.Tables.customer(spark, sf0001).count()
    assert(total == nCust, s"distribution covers $total of $nCust customers")
  }
}
