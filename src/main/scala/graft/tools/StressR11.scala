package graft.tools

import graft.GraftSession
import graft.tools.StressUtil.{cachedDir, symlinkTables, time}
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

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_STRESS_MULT", "10").toInt
    val spark = GraftSession.local(32, "graft-stress-r11")
    import spark.implicits._

    val meter = new StressUtil.Meter(spark)
    def measured[A](label: String)(f: => A): (A, Double, Long, Long) =
      meter.measured(label)(f)

    // ------------------------------------------------------- corpus dirs
    // The ×1 floor is ALSO a rewritten dir (4 part files) so file
    // granularity scales with data exactly as a real warehouse's does —
    // comparing against the single-file base dir would conflate data
    // volume with input-split parallelism (the first probe did).
    def buildDir(mult: Int): String = {
      val dir = s"/tmp/graft_stress_r11_x$mult"
      cachedDir(dir, base) {
        val (_, tLi) = time {
          // repartition: a 10× warehouse holds 10× FILES, not one
          // 10×-sized file — without this the whole replica landed in one
          // part file and every downstream scan ran 1-2 input splits (the
          // first probe measured j_range_binned single-task-bound for
          // exactly that reason, max task ≈ wall)
          graft.tables.Tables
            .lineitem(spark, base)
            .withColumn("rep", explode(sequence(lit(0), lit(mult - 1))))
            .drop("rep")
            .repartition(4 * mult)
            .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
        }
        val (_, tDocs) = time {
          graft.tables.Tables
            .documents(spark, base)
            .withColumn("rep", explode(sequence(lit(0), lit(mult - 1))))
            .select(
              (($"doc_id" * mult) + $"rep").as("doc_id"),
              StressUtil.perturb($"text", $"doc_id", $"rep").as("text"),
              $"lang", $"source", $"n_chars")
            .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        }
        symlinkTables(dir, base,
          Seq("region", "nation", "customer", "supplier", "part", "orders", "events", "embeddings"))
        println(f"- corpus ×$mult build: lineitem $tLi%.1f s, documents $tDocs%.1f s")
      }
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
