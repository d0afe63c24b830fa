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
}
