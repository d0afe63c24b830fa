package graft.queries

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: symmetry exact, star center dominates, mass conserved") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pr").toString
    // star: part 1 ↔ suppliers 1..4; separate pair: part 2 ↔ supplier 5
    Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L), (2L, 5L))
      .toDF("l_partkey", "l_suppkey")
      .write
      .mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val r = Graph
      .gPagerank(spark, dir)
      .collect()
      .map(row => row.getString(0) -> row.getDouble(1))
      .toMap
    assert(r.size == 7)
    // symmetric leaves get EXACTLY equal ranks (identical decimal sums)
    assert(Set("s1", "s2", "s3", "s4").map(r).size == 1)
    assert(r("p2") == r("s5"))
    // the hub outranks its leaves; an isolated pair splits evenly above
    // the leaf rank (its nodes keep degree-1 mass instead of feeding a hub)
    assert(r("p1") > r("s1"))
    // total mass conserved: jump adds 0.15/N per node, the damped term
    // redistributes what the previous round held
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
  }

  test("triangleStats: K4 has 4 triangles, 12 wedges, coefficient 1") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("u", "v")
    val (tri, wedges) = Graph.triangleStats(k4)
    assert(tri == 4L, s"K4 triangles: $tri")
    assert(wedges == 12L, s"K4 wedges: $wedges")
  }

  test("triangleStats: a path has no triangles but counts its wedges") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val (tri, wedges) = Graph.triangleStats(path)
    assert(tri == 0L)
    assert(wedges == 2L) // the two interior nodes each center one wedge
  }

  test("triangleStats: staged src-bucket passes count exactly what one pass counts") {
    // the multi-pass branch only fires past the wedge budget, so at the
    // gate SFs it is dead code to the oracle gate — pin it on K20
    // (oriented wedges Σ C(k,2) for k=0..19 = C(20,3) = 1140, triangles
    // C(20,3) = 1140): a 100-wedge budget forces 12 bucket waves, whose
    // union must equal the single-pass count exactly
    val k20 = (for { u <- 1L to 20L; v <- (u + 1) to 20L } yield (u, v)).toDF("u", "v")
    val (one, w1) = Graph.triangleStats(k20)
    assert(one == 1140L, s"K20 single-pass triangles: $one")
    spark.conf.set("spark.graft.triangles.wedgesPerPass", "100")
    try {
      val (staged, w2) = Graph.triangleStats(k20)
      assert(staged == one && w2 == w1, s"staged $staged/$w2 != single-pass $one/$w1")
    } finally spark.conf.unset("spark.graft.triangles.wedgesPerPass")
  }

  test("g_hops: BFS distances on a synthetic order chain") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bfs").toString
    // orders chain parts 10-20, 20-30, 30-40: BFS from {10} → hops 0,1,2,3
    Seq((1L, 10L), (1L, 20L), (2L, 20L), (2L, 30L), (3L, 30L), (3L, 40L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((10L, Graph.hopSeedBrand), (20L, "Brand#99"), (30L, "Brand#99"), (40L, "Brand#99"))
      .toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val hops = Graph.gHops(spark, dir).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(hops == Map(10L -> 0, 20L -> 1, 30L -> 2, 40L -> 3))
  }

  test("g_label_prop: disjoint cliques converge to their min-id labels") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lpa").toString
    // two disjoint co-purchase triangles: {1,2,3} and {10,11,12}
    Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 10L), (2L, 11L), (2L, 12L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = Graph.gLabelProp(spark, dir).collect()
    val lab = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
    out.foreach(r => assert(r.getLong(2) == 3L)) // both communities size 3
  }

  test("g_sssp: cheap two-hop path beats the heavy direct edge") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sssp").toString
    // edges (min summed qty): 10-20 w=2, 20-30 w=2, 10-30 w=50 —
    // weighted distance to 30 is 4 via 20, while BFS would stop at hop 1
    Seq(
      (1L, 10L, 1.0), (1L, 20L, 1.0),
      (2L, 20L, 1.0), (2L, 30L, 1.0),
      (3L, 10L, 25.0), (3L, 30L, 25.0)
    ).toDF("l_orderkey", "l_partkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((10L, Graph.hopSeedBrand), (20L, "Brand#99"), (30L, "Brand#99"))
      .toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val dist = Graph.gSssp(spark, dir).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(dist == Map(10L -> 0, 20L -> 2, 30L -> 4))
  }

  test("g_sssp: duplicate lines collapse to the per-(order,part) min quantity") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sssp2").toString
    // the same (order, part) appears twice with different quantities —
    // the edge weight must use the min (3 + 1 = 4), not either duplicate
    Seq((1L, 10L, 7.0), (1L, 10L, 3.0), (1L, 20L, 1.0))
      .toDF("l_orderkey", "l_partkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((10L, Graph.hopSeedBrand), (20L, "Brand#99"))
      .toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val dist = Graph.gSssp(spark, dir).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(dist == Map(10L -> 0, 20L -> 4))
  }

  test("adamic-adar: planted path scores the distance-2 pair by its center's degree") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-aa").toString
    // co-purchase edges: 10—20 (order 1), 20—30 (order 2), 20—40 (order 3)
    // → seed 10's only distance-2 candidates are 30 and 40, both through
    // center 20 with deg 3 → aa = round(1/ln 3, 9) each
    Seq((1L, 10L), (1L, 20L), (2L, 20L), (2L, 30L), (3L, 20L), (3L, 40L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((10L, Graph.hopSeedBrand), (20L, "Brand#99"), (30L, "Brand#99"), (40L, "Brand#99"))
      .toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val rows = Graph.gAdamicAdar(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val want = BigDecimal(1.0 / math.log(3.0)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.toSet == Set((10L, 30L, 1L, want), (10L, 40L, 1L, want)), rows.toSeq.toString)
  }
}
