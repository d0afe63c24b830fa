package graft.queries

import graft.syntax._
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics — PageRank over the part↔supplier
  * co-purchase graph. Connected components (the other canonical
  * iterative workload) already powers the dedup cluster path
  * ([[graft.dedup.Dedup]]); PageRank adds the damped-power-iteration
  * shape: a fixed number of join+aggregate rounds with lineage cut per
  * round.
  *
  * Scale design: the edge list — the 100 TB side — is built once,
  * pre-partitioned on `src` and persisted, so every iteration's
  * contribution join reuses that partitioning (the cached
  * outputPartitioning satisfies the join's distribution requirement; only
  * the tiny rank table moves per round). Each round localCheckpoints the
  * new ranks — without the cut, round k's plan would replay rounds
  * 1..k-1 and the lineage would grow quadratically. Contributions sum in
  * DECIMAL(38,18), so the result is partitioning-invariant and the DuckDB
  * oracle (10 unrolled CTE rounds) matches hash-exactly.
  */
object Graph {
  type Q = (SparkSession, String) => DataFrame

  val iterations = 10
  val damping    = 0.85

  /** Undirected bipartite edges: one row per distinct (part, supplier)
    * pair in lineitem, both directions, node ids disambiguated with a
    * p/s prefix.
    */
  private def edgeList(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables
      .lineitem(s, d)
      .select(
        concat(lit("p"), $"l_partkey").as("p"),
        concat(lit("s"), $"l_suppkey").as("q")
      )
      .distinct()
    pairs
      .select($"p".as("src"), $"q".as("dst"))
      .unionAll(pairs.select($"q".as("src"), $"p".as("dst")))
  }

  val gPagerank: Q = (s, d) => {
    val cpus = s.sparkContext.defaultParallelism
    val edges = edgeList(s, d).repartition(cpus, $"src").persist()
    // persisted too: consumed by every round's join plus the init
    val outdeg = edges.groupBy($"src").agg(count(lit(1)).as("outdeg")).persist()
    try {
      // every edge endpoint appears as a src (edges are undirected), so
      // the src side IS the node set — no dangling-mass term needed
      val n = outdeg.count()
      // 0.15 literally, NOT (1 - damping): IEEE 1.0 - 0.85 is
      // 0.15000000000000002 and the oracle's 0.15 would diverge
      val jump = 0.15 / n
      var ranks = outdeg.select($"src".as("node"), lit(1.0 / n).as("rank")).localCheckpoint()
      for (_ <- 1 to iterations) {
        val contribs = edges
          .join(ranks.withColumnRenamed("node", "src"), "src")
          .join(outdeg, "src")
          .select($"dst", ($"rank" / $"outdeg").as("contrib"))
        ranks = contribs
          .groupBy($"dst".as("node"))
          .agg(
            (lit(jump) + lit(damping) *
              sum($"contrib".cast("decimal(38,18)")).cast("double")).as("rank")
          )
          .localCheckpoint()
      }
      ranks
        .select($"node", round($"rank", 9).as("rank"))
        .orderBy($"node")
    } finally {
      edges.unpersist()
      outdeg.unpersist()
    }
  }

  val queries: Map[String, Q] = Map(
    "g_pagerank" -> gPagerank
  )

  private val base =
    """edges0 AS (
      |  SELECT DISTINCT 'p' || l_partkey AS p, 's' || l_suppkey AS q FROM lineitem),
      |edges AS (
      |  SELECT p AS src, q AS dst FROM edges0
      |  UNION ALL SELECT q AS src, p AS dst FROM edges0),
      |outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
      |n AS (SELECT COUNT(*) AS n FROM outdeg),
      |r0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) / n AS rank FROM outdeg, n)""".stripMargin

  private def prRound(i: Int): String =
    s"""r$i AS (
       |  SELECT e.dst AS node,
       |    ((CAST(0.15 AS DOUBLE) / n) + 0.85 * CAST(SUM(CAST(r.rank / o.outdeg AS DECIMAL(38,18))) AS DOUBLE)) AS rank
       |  FROM edges e
       |  JOIN r${i - 1} r ON e.src = r.node
       |  JOIN outdeg o ON e.src = o.src, n
       |  GROUP BY e.dst, n.n)""".stripMargin

  val oracles: Map[String, String] = Map(
    "g_pagerank" ->
      s"""WITH $base,
         |${(1 to iterations).map(prRound).mkString(",\n")}
         |SELECT node, round(rank, 9) AS rank
         |FROM r$iterations ORDER BY node""".stripMargin
  )
}
