package graft.tools

import graft.GraftSession
import graft.tools.StressUtil.{cachedDir, symlinkTables, time}
import org.apache.spark.sql.functions._

/** Batch-scale linearity probe #3 — the GRAPH family, the one headline
  * family without 10× evidence ([[StressR11]]: dedup/range-join/arima;
  * [[StressR11b]]: ann/text/web). Same corrected methodology (scaled
  * file counts, base-dir JIT warmup, settled listener counters).
  *
  * The co-purchase graphs derive from lineitem (edgeList: part↔supplier
  * bipartite; coEdges: part–part within an order), so the corpus scales
  * by replicating lineitem with ALL THREE graph keys offset per replica
  * (`key * mult + rep`) — `mult` DISJOINT copies of the base graph:
  * nodes, edges, triangles and components all grow ×mult while degree
  * structure stays constant, which is exactly the claim to measure (work
  * scales with the graph, not quadratically with the corpus; the
  * per-round localCheckpoint/persist discipline holds as rounds carry
  * ×mult state).
  *
  *  - `g_pagerank`: 10 damped power-iteration rounds — per-round join
  *    cost should scale ~linearly with edges; rank state ×mult.
  *  - `g_triangles`: wedge join oriented by (degree, id) — the
  *    quadratic-risk shape; disjoint replicas keep wedge counts ×mult.
  *  - `g_adamic_adar`: common-neighbor scoring over coEdges — the
  *    bucketed pair join.
  *  - `g_label_prop`: iterative label exchange until the fixed round
  *    budget — per-round shuffle ×mult.
  *
  * Output: wall / shuffle / max-task markdown bullets for BENCH_LOCAL
  * §r11.
  */
object StressR11c {

  def main(args: Array[String]): Unit = {
    val base  = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult  = sys.env.getOrElse("SPARK_GRAFT_STRESS_MULT", "10").toInt
    val spark = GraftSession.local(32, "graft-stress-r11c")
    // fleet-emulation knob: a 1000-executor cluster runs a ×100 corpus
    // with cluster-scaled shuffle.partitions, not this box's 32 — the
    // override lets the probe measure that granularity directly (the
    // per-partition footprint shrinks; max task should drop in kind)
    sys.env.get("SPARK_GRAFT_SHUFFLE_PARTS").foreach { p =>
      spark.conf.set("spark.sql.shuffle.partitions", p)
    }
    import spark.implicits._
    val meter = new StressUtil.Meter(spark)

    def buildDir(mult: Int): String = {
      val dir = s"/tmp/graft_stress_r11c_x$mult"
      cachedDir(dir, base, recipe = "part-scaled-v2") {
        val (_, t) = time {
          graft.tables.Tables
            .lineitem(spark, base)
            .withColumn("rep", explode(sequence(lit(0), lit(mult - 1))))
            .withColumn("l_orderkey", $"l_orderkey" * mult + $"rep")
            .withColumn("l_partkey", $"l_partkey" * mult + $"rep")
            .withColumn("l_suppkey", $"l_suppkey" * mult + $"rep")
            .drop("rep")
            .repartition(4 * mult)
            .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
        }
        // part scales WITH the graph keys: g_adamic_adar/g_hops seed from
        // p_brand parts, and an unscaled part table would leave the
        // replica keyspace almost seedless — the probe would measure a
        // degenerate wedge frontier, not data scaling (r11c self-review)
        val (_, tp) = time {
          graft.tables.Tables
            .part(spark, base)
            .withColumn("rep", explode(sequence(lit(0), lit(mult - 1))))
            .withColumn("p_partkey", $"p_partkey" * mult + $"rep")
            .drop("rep")
            .repartition(math.max(4, mult / 2))
            .write.mode("overwrite").parquet(s"$dir/part.parquet")
        }
        symlinkTables(dir, base,
          Seq("region", "nation", "customer", "supplier", "orders",
            "events", "documents", "embeddings"))
        println(f"- corpus ×$mult build: lineitem $t%.1f s, part $tp%.1f s")
      }
    }

    println(s"### r11c batch ${mult}x stress — graph family (base=$base)")
    println("")
    val dir1 = buildDir(1)
    val dirN = buildDir(mult)

    def run(name: String, dd: String, warm: Boolean = false): Unit = {
      val fn = graft.SparkEntry.queries(name)
      if (warm) { fn(spark, dd).write.mode("overwrite").parquet("/tmp/graft_stress_r11c_out"); () }
      else
        meter.measured(s"$name @${new java.io.File(dd).getName}") {
          fn(spark, dd).write.mode("overwrite").parquet("/tmp/graft_stress_r11c_out")
        }
      spark.catalog.clearCache()
    }

    val qs = sys.env.get("SPARK_GRAFT_STRESS_QUERIES")
      .map(_.split(',').toSeq)
      .getOrElse(Seq("g_pagerank", "g_triangles", "g_adamic_adar", "g_label_prop"))
    qs.foreach { q =>
      run(q, base, warm = true) // JIT/codegen warmup, untimed
      run(q, dir1)              // ×1 floor: same layout/file granularity
      run(q, dirN)              // ×mult
    }
    spark.stop()
  }
}
