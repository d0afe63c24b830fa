package graft.tools

import graft.GraftSession
import graft.dedup.Hashing
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Batch-scale linearity probe for the three heaviest headline families
  * (judge r10 next-round #2 — give the batch paths the measured-at-scale
  * datapoints the streaming gate already has) plus the skew-join A/B
  * (#7). Builds a 10× corpus DIRECTORY shaped exactly like a driver sf
  * dir — lineitem/documents row-replicated, every other table symlinked
  * — and drives the REAL driver query functions against it, so the
  * measured plans are the shipped plans:
  *
  *  - `m_arima_forecast` ×10: lineitem rows replicate verbatim (weekly
  *    weights scale ×10, series length and profile count fixed), so the
  *    rollup input grows 10× while the per-profile grid fit — the sf0.1
  *    dominant cost — is constant: wall should grow far SUB-linearly,
  *    pinning "fit parallelizes by profile, scan scales out".
  *  - `j_range_binned` ×10 FACT-side: lineitem ×10 with orders fixed —
  *    candidate pairs and output counts scale ×10, so wall should track
  *    ~linearly. (Scaling BOTH sides is output-quadratic by definition —
  *    every order matches every in-window lineitem — so fact-side
  *    scaling is the claim a plan can actually be held to; the bin
  *    equi-key keeps candidates output-bound either way.)
  *  - `dedup_minhash_pairs` ×10: the Stress-tool perturbation (replica-
  *    unique hash tokens interleaved between words, every 50th replica
  *    verbatim = planted dup clusters), signature UDF cost dominates —
  *    expected ~linear.
  *  - skew A/B: lineitem ×10 with HALF of all rows remapped to one hot
  *    part key (Zipf head), salted (SkewJoin, 8 salts) vs unsalted
  *    aggregate-join; records wall + max single-task duration — the
  *    straggler the salt spread removes.
  *
  * Per run it reports wall seconds and total shuffle bytes (task-metrics
  * listener), the two numbers the 100 TB brief argues from. Output:
  * markdown bullets for BENCH_LOCAL §r11.
  */
object StressR11 {

  private def t[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_STRESS_MULT", "10").toInt
    val spark = GraftSession.local(32, "graft-stress-r11")
    import spark.implicits._

    // shuffle-bytes + straggler probe: shared bus, reset between runs
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val maxTaskMs    = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        Option(te.taskMetrics).foreach { m =>
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          maxTaskMs.getAndAccumulate(m.executorRunTime, math.max)
        }
    })
    // listener events are async: poll until the counters are stable
    // (the StressStreamGate precedent)
    def settle(): Unit = {
      var last = (-1L, -1L)
      var cur  = (shuffleBytes.get(), maxTaskMs.get())
      while (cur != last) { last = cur; Thread.sleep(200); cur = (shuffleBytes.get(), maxTaskMs.get()) }
    }
    def measured[A](label: String)(f: => A): (A, Double, Long, Long) = {
      // settle BEFORE the reset too (r11 review): a preceding unmeasured
      // warm run's straggler task-end events would otherwise land after
      // the reset and pollute this run's counters
      settle()
      shuffleBytes.set(0L); maxTaskMs.set(0L)
      val (r, wall) = t(f)
      settle()
      val out = (r, wall, shuffleBytes.get(), maxTaskMs.get())
      println(f"- $label: wall $wall%.1f s, shuffle ${out._3 / 1e6}%.0f MB, max task ${out._4 / 1e3}%.1f s")
      out
    }

    // ------------------------------------------------------- corpus dirs
    // The ×1 floor is ALSO a rewritten dir (4 part files) so file
    // granularity scales with data exactly as a real warehouse's does —
    // comparing against the single-file base dir would conflate data
    // volume with input-split parallelism (the first probe did).
    def buildDir(mult: Int): String = {
    val dir = s"/tmp/graft_stress_r11_x$mult"
    val d   = new java.io.File(dir)
    if (!new java.io.File(s"$dir/_READY").exists()) {
      org.apache.commons.io.FileUtils.deleteQuietly(d)
      // a rebuilt corpus invalidates any boundary-oracle dumps derived
      // from the previous build under the same basename (writeOnce's
      // per-path contract assumes path ⇒ content)
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(graft.OracleIo.dir(dir)))
      d.mkdirs()
      val (_, tLi) = t {
        // repartition: a 10× warehouse holds 10× FILES, not one 10×-sized
        // file — without this the whole replica landed in one part file
        // and every downstream scan ran 1-2 input splits (the first probe
        // measured j_range_binned single-task-bound for exactly that
        // reason, max task ≈ wall)
        graft.tables.Tables
          .lineitem(spark, base)
          .withColumn("rep", explode(sequence(lit(0), lit(mult - 1))))
          .drop("rep")
          .repartition(4 * mult)
          .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      }
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
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      }
      Seq("region", "nation", "customer", "supplier", "part", "orders", "events", "embeddings")
        .foreach { tbl =>
          java.nio.file.Files.createSymbolicLink(
            java.nio.file.Paths.get(s"$dir/$tbl.parquet"),
            java.nio.file.Paths.get(s"$base/$tbl.parquet"))
        }
      new java.io.File(s"$dir/_READY").createNewFile()
      println(f"- corpus ×$mult build: lineitem $tLi%.1f s, documents $tDocs%.1f s")
    } else println(s"- corpus ×$mult cached")
    dir
    }

    println(f"### r11 batch 10x stress (base=$base)")
    println("")
    val dir1  = buildDir(1)
    val dirN  = buildDir(mult)

    def run(name: String, dd: String, warm: Boolean = false): Unit = {
      val fn = graft.SparkEntry.queries(name)
      if (warm) { fn(spark, dd).write.mode("overwrite").parquet("/tmp/graft_stress_r11_out"); () }
      else
        measured(s"$name @${new java.io.File(dd).getName}") {
          fn(spark, dd).write.mode("overwrite").parquet("/tmp/graft_stress_r11_out")
        }
      spark.catalog.clearCache()
    }

    Seq("m_arima_forecast", "j_range_binned", "dedup_minhash_pairs").foreach { q =>
      // warm on BASE, not dir1 (r11 review): OracleIo.writeOnce memoizes
      // the signature boundary dump per path, so a dir1 warm pass would
      // consume dir1's one-time dump write and the measured ×1 pass
      // would skip the signature UDF the ×10 pass pays — base's path is
      // distinct, leaving ×1 and ×10 with symmetric first-touch work
      run(q, base, warm = true) // JIT/codegen warmup, untimed
      run(q, dir1)              // ×1 floor: same layout, 4 part files
      run(q, dirN)              // ×10: 40 part files
    }

    // ------------------------------------------------- skew-join A/B
    // Salting only matters for SHUFFLE joins: with `part` under the
    // broadcast threshold the hot key never crosses an exchange and the
    // first probe measured salting as pure overhead. The 100 TB case the
    // brief argues from is dim-too-big-to-broadcast, so force sort-merge
    // and A/B three ways: unsalted with AQE's own skew splitter off,
    // unsalted with it on (Spark's built-in remedy), and the explicit
    // salt spread — on a 50%-of-rows hot key.
    val hot = graft.tables.Tables
      .lineitem(spark, dirN)
      .withColumn(
        "p_partkey",
        when($"l_orderkey" % 2 === 0, lit(1L)).otherwise($"l_partkey"))
      .select($"p_partkey", $"l_quantity", $"l_extendedprice")
    val p = graft.tables.Tables.part(spark, dirN)
    def aggJoin(joined: org.apache.spark.sql.DataFrame) = joined
      .groupBy($"p_brand")
      .agg(sum($"l_quantity").as("q"), count(lit(1)).as("n"))
    def withConf[A](pairs: (String, String)*)(f: => A): A = {
      val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f
      finally saved.foreach { case (k, o) => o.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    }
    val results = withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val (rNoAqe, _, _, _) = withConf("spark.sql.adaptive.skewJoin.enabled" -> "false") {
        measured("skew SMJ unsalted, AQE skew OFF @10x, 50% hot key") {
          aggJoin(hot.join(p, Seq("p_partkey"))).collect()
        }
      }
      val (rAqe, _, _, _) = measured("skew SMJ unsalted, AQE skew ON @10x, 50% hot key") {
        aggJoin(hot.join(p, Seq("p_partkey"))).collect()
      }
      val (rSalt, _, _, _) = measured("skew SMJ SALTED (8 salts) @10x, 50% hot key") {
        aggJoin(graft.queries.SkewJoin.saltedInnerJoin(hot, p, "p_partkey", salts = 8)).collect()
      }
      Seq(rNoAqe, rAqe, rSalt)
    }
    val canon = results.map(_.sortBy(_.getString(0)).toSeq)
    require(canon.forall(_ == canon.head), "skew-join variants disagree")
    println("- all three skew-join variants byte-identical")
    spark.stop()
  }
}
