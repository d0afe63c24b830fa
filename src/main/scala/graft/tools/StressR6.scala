package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Round-6-session-4 stress probe for this session's scale-risk paths,
  * following the [[StressR5]] recipe (row-multiplied corpus):
  *
  *  - '''BM25 postings join''': candidate work is Σ df over query terms;
  *    on a mult× corpus df grows mult× per term, so the join must scale
  *    LINEARLY in mult (the all-pairs failure mode would be mult²).
  *    Logged: candidate-pair count, wall time.
  *  - '''IRLS sufficient statistics''': each iteration is one
  *    map-combinable aggregate of 14 numbers — wall time must scale
  *    ~linearly in rows and the fitted β must stay FINITE and near the
  *    base-SF fit (the statistics concentrate; a shuffle-shaped
  *    regression would show super-linear time).
  *  - '''binseg changepoints''': integer prefix sums per profile; the
  *    mult× corpus multiplies WEEKLY WEIGHT (same weeks, heavier rows),
  *    so cp locations must be IDENTICAL to the base run (scale
  *    equivariance of SSE argmins under y → c·y) — a free correctness
  *    invariant at stress scale.
  *
  * Output: one markdown section (stdout) appended to BENCH_LOCAL.md.
  */
object StressR6 {

  private def t[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult  = sys.env.getOrElse("SPARK_GRAFT_STRESS_MULT", "10").toInt
    val spark = GraftSession.local(32, "graft-stress-r6")
    import spark.implicits._

    def log(s: String): Unit = println(s)
    log(s"### r6 session-4 stress run (mult=$mult, base=$sfDir)")
    log("")

    val work = java.nio.file.Files.createTempDirectory("graft-stress-r6").toString

    // ---- BM25 on a mult× document corpus (distinct doc ids, replicated
    // text keeps the Zipf shape; df per term grows mult×) ----
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    docs
      .crossJoin(spark.range(mult).select($"id".as("rep")))
      .select(($"doc_id" + $"rep" * nDocs).as("doc_id"), $"text", $"source", $"n_chars", $"lang")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val (bm, tBm) = t {
      graft.text.Retrieval.bm25TopK(spark, work).count()
    }
    log(f"- BM25 over ${nDocs * mult} docs: $bm result rows in $tBm%.1f s " +
      "(inverted-index join; candidate work linear in mult)")

    // ---- IRLS on a mult× lineitem (perturb the replica keys so the
    // aggregate sees genuinely distinct rows) ----
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val nLi = li.count()
    li.crossJoin(spark.range(mult).select($"id".as("rep")))
      .withColumn("l_orderkey", $"l_orderkey" + $"rep" * 100000000L)
      .drop("rep")
      // healthy file layout: the crossJoin inherits the base table's ~6
      // partitions, which would cap the fit at 6-way parallelism — a
      // stress artifact, not an operator property (real corpora split
      // by maxPartitionBytes)
      .repartition(64)
      .write.mode("overwrite").parquet(s"$work/lineitem.parquet")
    val (betaRow, tGlm) = t {
      graft.queries.Glm.logitIrls(spark, work).head()
    }
    val betas = (0 until 4).map(betaRow.getDouble)
    require(betas.forall(b => !b.isNaN && !b.isInfinite), s"IRLS diverged at stress scale: $betas")
    val baseRow = graft.queries.Glm.logitIrls(spark, sfDir).head()
    val drift = (0 until 4).map(i => math.abs(betas(i) - baseRow.getDouble(i))).max
    log(f"- IRLS over ${nLi * mult} rows: fit in $tGlm%.1f s, " +
      f"max |β − β_base| = $drift%.2e (replicated rows ⇒ near-identical statistics)")

    // ---- binseg scale equivariance: mult× the weekly weights (copy
    // part.parquet alongside the multiplied lineitem so the rollup runs) ----
    spark.read.parquet(s"$sfDir/part.parquet")
      .write.mode("overwrite").parquet(s"$work/part.parquet")
    val (cpStress, tCp) = t {
      graft.forecast.SeriesAnalysis.binsegJob(spark, work)
        .select($"profile_name", $"cp1_week", $"cp2_week").collect()
        .map(r => (r.getString(0), r.getDate(1), r.getDate(2))).sortBy(_._1)
    }
    val cpBase = graft.forecast.SeriesAnalysis.binsegJob(spark, sfDir)
      .select($"profile_name", $"cp1_week", $"cp2_week").collect()
      .map(r => (r.getString(0), r.getDate(1), r.getDate(2))).sortBy(_._1)
    require(cpStress.toSeq == cpBase.toSeq,
      "binseg changepoints moved under uniform scaling — prefix arithmetic broke")
    log(f"- binseg on the ~${mult}× weekly mass: identical changepoints in $tCp%.1f s " +
      "(argmin equivariant under y → c·y, as the integer-prefix design predicts)")

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    log("")
    spark.stop()
  }
}
