package graft.sim

import graft.SparkSpec
import graft.syntax._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contract of the cell-blocked k-NN graph: well-formed (no self edges,
  * ≤k contiguous ranks per vector, exact cosines) and its recall vs the
  * exact brute-force graph is pinned — approximation lives ONLY in
  * candidate generation, as with the other IVF paths.
  */
class KnnGraphSpec extends SparkSpec {

  private lazy val graph =
    Similarity.knnGraph(spark, sf0001, k = 3, nCells = 8, nprobe = 3).collect()

  test("graph is well-formed: no self edges, contiguous ranks, at most k rows per vector") {
    assert(graph.nonEmpty)
    assert(!graph.exists(r => r.getLong(0) == r.getLong(1)), "self edge emitted")
    graph.groupBy(_.getLong(0)).foreach { case (p, rows) =>
      val ranks = rows.map(_.getInt(3)).sorted.toSeq
      assert(ranks == (1 to ranks.length), s"probe $p ranks not contiguous: $ranks")
      assert(ranks.length <= 3, s"probe $p emitted ${ranks.length} > k neighbors")
    }
  }

  test("recall vs the exact graph stays above the pinned floor") {
    val e = graft.tables.Tables
      .embeddings(spark, sf0001)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val exact = e
      .join(
        e.select($"vec_id".as("probe_id"), $"v".as("pv")),
        $"vec_id" =!= $"probe_id"
      )
      .select(
        $"probe_id",
        $"vec_id".as("neighbor_id"),
        round(Similarity.cosine($"pv", $"v"), 6).as("cosine")
      )
      .withColumn(
        "rank",
        row_number().over(Window.partitionBy($"probe_id").orderBy($"cosine".desc, $"neighbor_id"))
      )
      .filter($"rank" <= 3)
      .select($"probe_id", $"neighbor_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val got = graph.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    info(f"knn-graph recall@3 = $recall%.3f (${got.size} edges vs ${exact.size} exact)")
    assert(recall >= 0.60, f"recall collapsed: $recall%.3f")
  }
}
