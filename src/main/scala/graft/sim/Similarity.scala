package graft.sim

import graft.syntax._
import graft.tables.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` corpus (`Array[Float]`, 64-d).
  *
  * Two paths, per the brief:
  *  - '''brute force''' — broadcast the (small) probe set against the full
  *    corpus: one scan, map-side cosine, per-probe top-k via window. The
  *    correct baseline and the verify stage at any scale; cost O(probes·n).
  *  - '''IVF''' — coarse quantization: assign every vector to its nearest
  *    centroid (map-only against broadcast centroids), then probe only the
  *    `nprobe` nearest cells. At 100 TB the corpus is written partitioned
  *    by cell id, so a query touches `nprobe` partitions instead of the
  *    full scan — that's the scale path, traded against recall
  *    (SimilaritySpec measures it against brute force).
  *
  * All arithmetic is double-cast before folding: `aggregate` folds left
  * sequentially, bit-matching DuckDB's list_dot_product on DOUBLE[] for
  * the oracle.
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  /** Higher-order-function formulation — kept as the reference/back-up
    * path; interpreted per element, ~10× slower than [[cosine]].
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Native codegen'd kernel ([[graft.functions.Cosine64]]); same
    * left-to-right double folds, so values are bit-identical to the HOF
    * formulation and the DuckDB oracle.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosine64(a, b)

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Brute-force top-k cosine neighbors for probe vectors vec_id < 10.
    * Ranking is on the ROUNDED similarity + id tiebreak so the cut is
    * deterministic cross-engine.
    */
  def bruteForceTopK(s: SparkSession, d: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, d).select($"vec_id", asDouble($"embedding").as("v"))
    val probes = e.filter($"vec_id" < 10)
      .select($"vec_id".as("probe_id"), $"v".as("pv"))
    val sims = e
      .join(broadcast(probes), $"vec_id" =!= $"probe_id")
      .select(
        $"probe_id",
        $"vec_id".as("neighbor_id"),
        round(cosine($"pv", $"v"), 6).as("cosine")
      )
    val w = Window.partitionBy($"probe_id").orderBy($"cosine".desc, $"neighbor_id")
    sims
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .orderBy($"probe_id", $"rank")
  }

  /** IVF top-k: centroids = vectors with vec_id < nCells (deterministic
    * "training" stand-in for k-means — the plumbing, partitioning and
    * probe strategy are the real content); every vector assigned to its
    * max-cosine centroid; probes search their `nprobe` best cells only.
    */
  def ivfTopK(s: SparkSession, d: String, k: Int, nCells: Int, nprobe: Int): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, d).select($"vec_id", asDouble($"embedding").as("v"))
    val cents = e.filter($"vec_id" < nCells)
      .select($"vec_id".as("cell_id"), $"v".as("cv"))
    // assign: argmax cosine over broadcast centroids (map-only)
    val wAssign = Window.partitionBy($"vec_id").orderBy($"csim".desc, $"cell_id")
    val assigned = e
      .join(broadcast(cents), Nil, "cross")
      .select($"vec_id", $"v", $"cell_id", round(cosine($"v", $"cv"), 9).as("csim"))
      .withColumn("rn", row_number().over(wAssign))
      .filter($"rn" === 1)
      .select($"vec_id", $"v", $"cell_id")
    // probes: top nprobe cells each
    val probes = e.filter($"vec_id" < 10).select($"vec_id".as("probe_id"), $"v".as("pv"))
    val wProbe = Window.partitionBy($"probe_id").orderBy($"csim".desc, $"cell_id")
    val probeCells = probes
      .join(broadcast(cents), Nil, "cross")
      .select($"probe_id", $"pv", $"cell_id", round(cosine($"pv", $"cv"), 9).as("csim"))
      .withColumn("rn", row_number().over(wProbe))
      .filter($"rn" <= nprobe)
      .select($"probe_id", $"pv", $"cell_id")
    // search only assigned cells
    val wRank = Window.partitionBy($"probe_id").orderBy($"cosine".desc, $"neighbor_id")
    assigned
      .join(probeCells, Seq("cell_id"))
      .filter($"vec_id" =!= $"probe_id")
      .select($"probe_id", $"vec_id".as("neighbor_id"), round(cosine($"pv", $"v"), 6).as("cosine"))
      .withColumn("rank", row_number().over(wRank))
      .filter($"rank" <= k)
      .orderBy($"probe_id", $"rank")
  }

  val queries: Map[String, Q] = Map(
    "ann_bruteforce_topk" -> ((s, d) => bruteForceTopK(s, d, k = 5)),
    "ann_ivf_topk"        -> ((s, d) => ivfTopK(s, d, k = 5, nCells = 16, nprobe = 4))
  )

  val oracles: Map[String, String] = Map(
    "ann_bruteforce_topk" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 10),
        |sims AS (
        |  SELECT probe_id, e.vec_id AS neighbor_id,
        |    round(list_dot_product(pv, v)
        |      / sqrt(list_dot_product(pv, pv) * list_dot_product(v, v)), 6) AS cosine
        |  FROM e JOIN p ON e.vec_id <> p.probe_id)
        |SELECT probe_id, neighbor_id, cosine, rank FROM (
        |  SELECT *, CAST(row_number() OVER
        |    (PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
        |  FROM sims) t
        |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin
  )
}
