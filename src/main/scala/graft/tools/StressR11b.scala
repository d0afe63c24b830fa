package graft.tools

import graft.GraftSession
import graft.dedup.Hashing
import graft.tools.StressUtil.{cachedDir, symlinkTables, time}
import org.apache.spark.sql.functions._

/** Batch-scale linearity probe #2 — extends [[StressR11]]'s 10× evidence
  * from the three heaviest headline families to the ANN / text / new
  * web-curation families, with the same corrected methodology (file
  * counts scale with data; JIT warmup runs on the BASE dir so writeOnce
  * boundary dumps stay symmetric between the measured ×1 and ×10 passes;
  * listener counters settle before every reset — shared scaffolding in
  * [[StressUtil]]):
  *
  *  - `ann_ivf_topk` ×10: embeddings replicate with a deterministic
  *    per-replica perturbation (distinct vectors, same geometry), so
  *    k-means training, cell assignment and the probe join all see 10×
  *    points. Expected ~linear: every phase is a map or a cell-bucketed
  *    join; the centroid collect is k-sized, not corpus-sized.
  *  - `text_rare_score` ×10: the headline text query (vocab rollup +
  *    per-doc scoring) over the replica-unique perturbed corpus.
  *  - `text_bpe_encode` ×10 BOTH WAYS: the perturbed corpus grows the
  *    distinct-word table itself ~10× (the adversarial bound — train is
  *    linear in distinct words), while a VERBATIM replica keeps the word
  *    table constant and measures the realistic Zipf/Heaps shape (only
  *    the corpus scan grows; merge rounds stay vocabulary-sized).
  *  - `dedup_paragraph` ×10: the new CCNet-style paragraph dedup — one
  *    paragraph-hash shuffle, expected ~linear.
  *
  * Reports wall / shuffle bytes / max single-task per run, the numbers
  * the 100 TB brief argues from. Output: markdown bullets for
  * BENCH_LOCAL §r11.
  */
object StressR11b {

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_STRESS_MULT", "10").toInt
    val spark = GraftSession.local(32, "graft-stress-r11b")
    import spark.implicits._
    val meter = new StressUtil.Meter(spark)

    // Same shape as a driver sf dir: documents (+ embeddings when the
    // family needs them) replicated into mult-scaled file counts,
    // everything else symlinked.
    def buildDir(mult: Int, perturbText: Boolean): String = {
      val suffix = if (perturbText) "" else "v"
      val dir    = s"/tmp/graft_stress_r11b_x$mult$suffix"
      cachedDir(dir, base) {
        val textCol =
          if (perturbText) StressUtil.perturb($"text", $"doc_id", $"rep") else $"text"
        val (_, tDocs) = time {
          graft.tables.Tables
            .documents(spark, base)
            .withColumn("rep", explode(sequence(lit(0), lit(mult - 1))))
            .select(
              (($"doc_id" * mult) + $"rep").as("doc_id"),
              textCol.as("text"),
              $"lang", $"source", $"n_chars")
            .repartition(4 * mult)
            .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        }
        // distinct vectors per replica, same geometry: nudge each
        // component by a deterministic sub-1e-3 epsilon keyed on
        // (vec_id, rep, i)
        val nudge = udf { (v: Seq[Float], vecId: Long, rep: Int) =>
          val out = new Array[Float](v.length)
          var i = 0
          while (i < v.length) {
            val h = Hashing.hash64(s"$vecId:$rep:$i")
            out(i) = v(i) + ((h % 1000L).toFloat / 1e6f)
            i += 1
          }
          out
        }
        val (_, tEmb) = time {
          graft.tables.Tables
            .embeddings(spark, base)
            .withColumn("rep", explode(sequence(lit(0), lit(mult - 1))))
            .select(
              (($"vec_id" * mult) + $"rep").as("vec_id"),
              nudge($"embedding", $"vec_id", $"rep").as("embedding"),
              $"label")
            .repartition(4 * mult)
            .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
        }
        symlinkTables(dir, base,
          Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events"))
        println(f"- corpus ×$mult$suffix build: documents $tDocs%.1f s, embeddings $tEmb%.1f s")
      }
    }

    println(f"### r11b batch 10x stress — ann/text families (base=$base)")
    println("")
    val dir1 = buildDir(1, perturbText = true)
    val dirN = buildDir(mult, perturbText = true)

    def run(name: String, dd: String, warm: Boolean = false): Unit = {
      val fn = graft.SparkEntry.queries(name)
      if (warm) { fn(spark, dd).write.mode("overwrite").parquet("/tmp/graft_stress_r11b_out"); () }
      else
        meter.measured(s"$name @${new java.io.File(dd).getName}") {
          fn(spark, dd).write.mode("overwrite").parquet("/tmp/graft_stress_r11b_out")
        }
      spark.catalog.clearCache()
    }

    Seq("ann_ivf_topk", "text_rare_score", "text_bpe_encode", "dedup_paragraph").foreach { q =>
      run(q, base, warm = true) // JIT/codegen warmup, untimed
      run(q, dir1)              // ×1 floor: same layout/file granularity
      run(q, dirN)              // ×10
    }

    // ×10 verbatim: constant word table (see scaladoc)
    run("text_bpe_encode", buildDir(mult, perturbText = false))
    spark.stop()
  }
}
