package graft.tools

import graft.GraftSession
import graft.dedup.Hashing
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Batch-scale linearity probe #2 — extends [[StressR11]]'s 10× evidence
  * from the three heaviest headline families to the ANN / text / new
  * web-curation families, with the same corrected methodology (file
  * counts scale with data; JIT warmup runs on the BASE dir so writeOnce
  * boundary dumps stay symmetric between the measured ×1 and ×10 passes;
  * listener counters settle before every reset):
  *
  *  - `ann_ivf_topk` ×10: embeddings replicate with a deterministic
  *    per-replica perturbation (distinct vectors, same geometry), so
  *    k-means training, cell assignment and the probe join all see 10×
  *    points. Expected ~linear: every phase is a map or a cell-bucketed
  *    join; the centroid collect is k-sized, not corpus-sized.
  *  - `text_rare_score` ×10: the headline text query (vocab rollup +
  *    per-doc scoring) over the replica-unique perturbed corpus.
  *  - `text_bpe_encode` ×10: merge training is Zipf-bounded (word table,
  *    not corpus), encode is map-only — wall should grow well below 10×.
  *  - `dedup_paragraph` ×10: the new CCNet-style paragraph dedup — one
  *    paragraph-hash shuffle, expected ~linear.
  *
  * Reports wall / shuffle bytes / max single-task per run, the numbers
  * the 100 TB brief argues from. Output: markdown bullets for
  * BENCH_LOCAL §r11.
  */
object StressR11b {

  private def t[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_STRESS_MULT", "10").toInt
    val spark = GraftSession.local(32, "graft-stress-r11b")
    import spark.implicits._

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val maxTaskMs    = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        Option(te.taskMetrics).foreach { m =>
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          maxTaskMs.getAndAccumulate(m.executorRunTime, math.max)
        }
    })
    def settle(): Unit = {
      var last = (-1L, -1L)
      var cur  = (shuffleBytes.get(), maxTaskMs.get())
      while (cur != last) { last = cur; Thread.sleep(200); cur = (shuffleBytes.get(), maxTaskMs.get()) }
    }
    def measured[A](label: String)(f: => A): Unit = {
      settle()
      shuffleBytes.set(0L); maxTaskMs.set(0L)
      val (_, wall) = t(f)
      settle()
      println(f"- $label: wall $wall%.1f s, shuffle ${shuffleBytes.get() / 1e6}%.0f MB, max task ${maxTaskMs.get() / 1e3}%.1f s")
    }

    // ------------------------------------------------------- corpus dirs
    // Same shape as a driver sf dir: documents + embeddings replicated
    // into mult-scaled file counts, everything else symlinked.
    def buildDir(mult: Int): String = {
      val dir = s"/tmp/graft_stress_r11b_x$mult"
      val d   = new java.io.File(dir)
      if (!new java.io.File(s"$dir/_READY").exists()) {
        org.apache.commons.io.FileUtils.deleteQuietly(d)
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(graft.OracleIo.dir(dir)))
        d.mkdirs()
        val perturb = udf { (text: String, docId: Long, rep: Int) =>
          if (rep % 50 == 0) text
          else {
            val words = text.split(' ')
            val sb = new StringBuilder(text.length * 2)
            var i = 0
            while (i < words.length) {
              sb.append(words(i)).append(' ')
              if (i % 2 == 1) {
                sb.append('h')
                sb.append(java.lang.Long.toHexString(Hashing.hash64(s"$docId:$rep:$i")))
                sb.append(' ')
              }
              i += 1
            }
            sb.result().trim
          }
        }
        val (_, tDocs) = t {
          graft.tables.Tables
            .documents(spark, base)
            .withColumn("rep", explode(sequence(lit(0), lit(mult - 1))))
            .select(
              (($"doc_id" * mult) + $"rep").as("doc_id"),
              perturb($"text", $"doc_id", $"rep").as("text"),
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
        val (_, tEmb) = t {
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
        Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events")
          .foreach { tbl =>
            java.nio.file.Files.createSymbolicLink(
              java.nio.file.Paths.get(s"$dir/$tbl.parquet"),
              java.nio.file.Paths.get(s"$base/$tbl.parquet"))
          }
        new java.io.File(s"$dir/_READY").createNewFile()
        println(f"- corpus ×$mult build: documents $tDocs%.1f s, embeddings $tEmb%.1f s")
      } else println(s"- corpus ×$mult cached")
      dir
    }

    println(f"### r11b batch 10x stress — ann/text families (base=$base)")
    println("")
    val dir1 = buildDir(1)
    val dirN = buildDir(mult)

    def run(name: String, dd: String, warm: Boolean = false): Unit = {
      val fn = graft.SparkEntry.queries(name)
      if (warm) { fn(spark, dd).write.mode("overwrite").parquet("/tmp/graft_stress_r11b_out"); () }
      else
        measured(s"$name @${new java.io.File(dd).getName}") {
          fn(spark, dd).write.mode("overwrite").parquet("/tmp/graft_stress_r11b_out")
        }
      spark.catalog.clearCache()
    }

    Seq("ann_ivf_topk", "text_rare_score", "text_bpe_encode", "dedup_paragraph").foreach { q =>
      run(q, base, warm = true) // JIT/codegen warmup, untimed
      run(q, dir1)              // ×1 floor: same layout/file granularity
      run(q, dirN)              // ×10
    }

    // BPE's training state is the DISTINCT-word table, so the two ways a
    // corpus can grow measure different claims: the perturbed ×10 above
    // injects replica-unique tokens — the word table itself grows ~10×
    // (the adversarial bound: train is linear in distinct words) — while
    // a VERBATIM ×10 replica keeps the word table constant and measures
    // the realistic Zipf/Heaps shape: only the one corpus scan feeding
    // the word-frequency rollup grows, every merge round stays
    // vocabulary-sized.
    val dirV = {
      val dir = s"/tmp/graft_stress_r11b_x${mult}v"
      if (!new java.io.File(s"$dir/_READY").exists()) {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(graft.OracleIo.dir(dir)))
        new java.io.File(dir).mkdirs()
        graft.tables.Tables
          .documents(spark, base)
          .withColumn("rep", explode(sequence(lit(0), lit(mult - 1))))
          .select(
            (($"doc_id" * mult) + $"rep").as("doc_id"),
            $"text", $"lang", $"source", $"n_chars")
          .repartition(4 * mult)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        Seq("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings").foreach { tbl =>
          java.nio.file.Files.createSymbolicLink(
            java.nio.file.Paths.get(s"$dir/$tbl.parquet"),
            java.nio.file.Paths.get(s"$base/$tbl.parquet"))
        }
        new java.io.File(s"$dir/_READY").createNewFile()
      }
      dir
    }
    run("text_bpe_encode", dirV) // ×10 verbatim: constant word table
    spark.stop()
  }
}
