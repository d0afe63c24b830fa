package graft.queries

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning: correctness must be independent of
  * the bloom's false-positive rate (the exact join removes FPs), the
  * prefilter must actually cut the fact scan, and the predicate must be
  * codegen-resident (map-side, inside the scan stage).
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def plainJoin() = {
    val dim = RuntimeFilter.dimSlice(spark, sf0001)
      .select($"o_orderkey", $"o_orderpriority")
    Tables.lineitem(spark, sf0001)
      .join(dim, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"))
      .orderBy($"o_orderpriority")
      .collect().map(_.toSeq).toSeq
  }

  test("bloom-pruned join equals the plain join") {
    val pruned = RuntimeFilter.jBloomPrune(spark, sf0001)
      .select($"o_orderpriority", $"n_items").collect().map(_.toSeq).toSeq
    assert(pruned == plainJoin())
  }

  test("a tiny FP-heavy bloom still yields the exact result") {
    // 64 bits for ~1k keys: the bloom saturates and passes nearly
    // everything — the join must absorb every false positive
    val pruned = RuntimeFilter.jBloomPrune(spark, sf0001, numBits = 64)
      .select($"o_orderpriority", $"n_items").collect().map(_.toSeq).toSeq
    assert(pruned == plainJoin())
  }

  test("prefilter passes the matching rows plus a bounded FP tail") {
    val dim = RuntimeFilter.dimSlice(spark, sf0001)
    val bloom = RuntimeFilter.buildBloom(
      dim, $"o_orderkey", expectedKeys = 1 << 16, numBits = 1 << 20)
    val fact    = Tables.lineitem(spark, sf0001)
    val total   = fact.count()
    val passed  = RuntimeFilter.prunedFact(spark, sf0001, bloom).count()
    val matching = fact.join(dim.select($"o_orderkey"), $"l_orderkey" === $"o_orderkey",
      "left_semi").count()
    // no false negatives: every matching row passes
    assert(passed >= matching)
    // the prune is real: the slice is ~1.5% of the fact, FP rate ~1% of
    // the remainder — passed must sit far below the full scan
    assert(passed < total / 2,
      s"bloom passed $passed of $total rows — prefilter is not pruning")
  }

  test("incremental bloom dedup: a saturated FP-heavy bloom changes nothing (verify absorbs FPs)") {
    val normal = RuntimeFilter.dedupIncrementalBloom(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // 64-bit bloom ≈ everything passes — the exact semi-join must still
    // produce the identical confirmed set
    val saturated = RuntimeFilter.dedupIncrementalBloom(spark, sf0001, numBits = 64).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(normal == saturated, "bloom FP rate leaked into the result")
    assert(normal.nonEmpty, "no cross-batch prefix collisions — the positive control is dead")
  }

  test("the bloom predicate evaluates inside the scan stage, before any exchange") {
    val df = RuntimeFilter.jBloomPrune(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val iFilter = plan.indexOf("might_contain")
    assert(iFilter >= 0, s"no bloom predicate in plan:\n$plan")
    // map-side: the predicate sits below the first exchange of its
    // branch — i.e. some scan follows it with no exchange in between
    val iExch = plan.indexOf("Exchange", iFilter)
    val iScan = plan.indexOf("Scan parquet", iFilter)
    assert(iScan >= 0 && (iExch < 0 || iScan < iExch),
      s"bloom predicate is not map-side over the fact scan:\n$plan")
  }
}
