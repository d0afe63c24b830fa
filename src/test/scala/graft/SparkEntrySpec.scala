package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: no module may silently shadow another's
  * query key (Map ++ overwrites), and every oracle refers to a real query.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("query keys are globally unique across modules") {
    // same module list the merge uses — Map ++ overwrites, so a duplicate
    // key shows up as merged-size < summed-size
    val total = SparkEntry.queryModules.map(_.size).sum
    assert(SparkEntry.queries.size == total,
      s"key collision: merged ${SparkEntry.queries.size} != sum $total")
    val dups = SparkEntry.queryModules.flatMap(_.keys)
      .groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"duplicate query keys: $dups")
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry returns rows (driver smoke contract)") {
    val spark = GraftSession.local(4, "entry-smoke")
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
