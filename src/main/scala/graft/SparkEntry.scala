package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Relational
import graft.forecast.ForecastJobs
import graft.etl.ZoloPipeline
import graft.text.TextAnalysis
import graft.dedup.Dedup
import graft.sim.Similarity
import graft.mm.Multimodal

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator family's query map;
  * `oracleSql` the matching DuckDB SQL. Keys line up 1:1; queries without
  * an oracle entry (iterative model fits, sketch-based ops) get the
  * driver's weaker rows-only check and are tolerance-tested in ScalaTest
  * instead (FIXTURES.md §4).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** Every module's query map, kept as a Seq so SparkEntrySpec can assert
    * global key uniqueness against the SAME list the merge uses (Map ++
    * silently overwrites — a duplicate key would shadow a query and the
    * driver would never run it).
    */
  private[graft] val queryModules: Seq[Map[String, (SparkSession, String) => DataFrame]] =
    Seq(
      Relational.queries, graft.queries.Tpch.queries, graft.queries.Advanced.queries, graft.queries.Matching.queries,
      graft.queries.AsofJoin.queries, graft.queries.ZOrder.queries, graft.queries.Graph.queries,
      graft.queries.Cdc.queries, graft.queries.RuntimeFilter.queries, graft.queries.Glm.queries,
      ForecastJobs.queries, graft.forecast.SeriesAnalysis.queries, ZoloPipeline.queries,
      TextAnalysis.queries, graft.text.Chunking.queries, graft.text.Bpe.queries,
      graft.text.Retrieval.queries, graft.text.WebCurate.queries, Dedup.queries,
      Similarity.queries, graft.sim.HierIvf.queries, graft.sim.Pca.queries, Multimodal.queries, graft.mm.Jpeg.queries,
      graft.mm.Audio.queries,
      graft.streaming.StreamQueries.queries,
      graft.sources.RestQueries.queries,
      graft.functions.SqlSurfaceQueries.queries
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queryModules.reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ graft.queries.Tpch.oracles ++ graft.queries.Advanced.oracles ++ graft.queries.Matching.oracles ++
      graft.queries.AsofJoin.oracles ++ graft.queries.ZOrder.oracles ++ graft.queries.Graph.oracles ++ graft.queries.Cdc.oracles ++ graft.queries.RuntimeFilter.oracles ++ graft.queries.Glm.oracles ++ ForecastJobs.oracles ++ graft.forecast.SeriesAnalysis.oracles ++
      ZoloPipeline.oracles ++ TextAnalysis.oracles ++ graft.text.Chunking.oracles ++ graft.text.Bpe.oracles ++
      graft.text.Retrieval.oracles ++ graft.text.WebCurate.oracles ++
      Dedup.oracles ++ Similarity.oraclesWithNative ++ graft.sim.HierIvf.oracles ++ graft.sim.Pca.oracles ++ Multimodal.oracles ++
      graft.mm.Jpeg.oracles ++ graft.mm.Audio.oracles ++
      graft.streaming.StreamQueries.oracles ++ graft.sources.RestQueries.oracles ++
      graft.functions.SqlSurfaceQueries.oracles
}
