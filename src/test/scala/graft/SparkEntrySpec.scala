package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{Advanced, Relational}
import graft.forecast.ForecastJobs
import graft.etl.ZoloPipeline
import graft.text.TextAnalysis
import graft.dedup.Dedup
import graft.sim.Similarity
import graft.mm.Multimodal

/** Driver-contract invariants: no module may silently shadow another's
  * query key (Map ++ overwrites), and every oracle refers to a real query.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("query keys are globally unique across modules") {
    val maps = Seq(
      Relational.queries, Advanced.queries, graft.queries.Matching.queries,
      graft.queries.AsofJoin.queries,
      graft.queries.ZOrder.queries, graft.queries.Graph.queries, graft.queries.Cdc.queries,
      ForecastJobs.queries, graft.forecast.SeriesAnalysis.queries,
      ZoloPipeline.queries, TextAnalysis.queries, Dedup.queries,
      Similarity.queries, Multimodal.queries,
      graft.streaming.StreamQueries.queries, graft.text.Chunking.queries,
      graft.sources.RestQueries.queries
    )
    val total = maps.map(_.size).sum
    assert(SparkEntry.queries.size == total,
      s"key collision: merged ${SparkEntry.queries.size} != sum $total")
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
