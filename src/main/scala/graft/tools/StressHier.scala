package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Flat-vs-hierarchical IVF training A/B at scale — the follow-through
  * on the r7 1000× finding (BENCH_LOCAL §r7-1000×): with nCells ∝ n the
  * flat Lloyd assignment term is O(n·nCells·d) per iteration and was the
  * measured wall (432 s at 2M vectors × 16k cells); the named remedy is
  * hierarchical assignment, now implemented in [[graft.sim.HierIvf]].
  * This probe runs BOTH paths on the same jittered mult× corpus (the
  * StressR7 generator) with the same total cell count and probe budget,
  * and scores both against the exact brute-force top-k for the 10
  * probes (cheap: O(probes·n·d)), so the wall-time cut is reported next
  * to its recall cost.
  *
  * Output: one markdown section (stdout) appended to BENCH_LOCAL.md.
  */
object StressHier {

  private def t[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult  = sys.env.getOrElse("SPARK_GRAFT_STRESS_MULT", "100").toInt
    val runFlat = sys.env.getOrElse("SPARK_GRAFT_STRESS_FLAT", "1") == "1"
    val spark = GraftSession.local(32, "graft-stress-hier")
    import spark.implicits._

    def log(s: String): Unit = println(s)
    log(s"### hier-IVF stress A/B (mult=$mult, base=$sfDir)")
    log("")

    val work = java.nio.file.Files.createTempDirectory("graft-stress-hier").toString
    val emb  = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nEmb = emb.count()
    emb
      .crossJoin(spark.range(mult).select($"id".as("rep")))
      .select(
        ($"vec_id" + $"rep" * nEmb).as("vec_id"),
        zip_with(
          col("embedding"),
          transform(sequence(lit(0), size(col("embedding")) - 1),
            i => ((($"rep" * 31 + i) % lit(7) - lit(3)) * lit(0.001f))),
          (x, j) => x + j).as("embedding"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$work/embeddings.parquet")

    val nCells = 16 * mult // cell size held ~constant, per the operator contract
    val kc     = math.ceil(math.sqrt(nCells.toDouble)).toInt
    val kf     = math.ceil(nCells.toDouble / kc).toInt

    // exact reference for the probe set (vec_id < 10): brute force over
    // the mult× corpus is O(10·n·d) — linear, affordable at any mult here
    val exact = graft.sim.Similarity
      .bruteForceTopK(spark, work, k = 5)
      .select($"probe_id", $"neighbor_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

    def recallOf(rows: Array[org.apache.spark.sql.Row]): Double = {
      val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }

    if (runFlat) {
      val (flatRows, tFlat) = t {
        graft.sim.Similarity
          .ivfTopK(spark, work, k = 5, nCells = nCells, nprobe = 4)
          .select($"probe_id", $"neighbor_id")
          .collect()
      }
      log(f"- flat IVF   (${nEmb * mult} vectors, $nCells cells): " +
        f"${tFlat}%.1f s, recall@5 ${recallOf(flatRows)}%.3f " +
        f"(assignment O(n x $nCells x d) per Lloyd iter)")
    }

    val (hierRows, tHier) = t {
      graft.sim.HierIvf
        .ivfHierTopK(spark, work, k = 5, kc = kc, kf = kf, nprobe = 4, wCoarse = 2)
        .select($"probe_id", $"neighbor_id")
        .collect()
    }
    log(f"- hier IVF   (kc=$kc, kf=$kf = ${kc * kf} cells): " +
      f"${tHier}%.1f s, recall@5 ${recallOf(hierRows)}%.3f " +
      f"(coarse O(n x $kc x d) per iter + sampled fine + build O(n x ${kc + kf} x d))")

    // r8: the adaptive cutover — the PLAIN flat API at the same nCells
    // must delegate to the two-level path on its own (no caller opt-in)
    if (nCells > graft.sim.Similarity.hierCutoverCells) {
      val (autoRows, tAuto) = t {
        graft.sim.Similarity
          .ivfTopK(spark, work, k = 5, nCells = nCells, nprobe = 4)
          .select($"probe_id", $"neighbor_id")
          .collect()
      }
      log(f"- auto cutover (plain ivfTopK, nCells=$nCells > " +
        f"${graft.sim.Similarity.hierCutoverCells}): ${tAuto}%.1f s, " +
        f"recall@5 ${recallOf(autoRows)}%.3f — delegated to hier with no caller opt-in")
    }

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    log("")
    spark.stop()
  }
}
