package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The HLL construction's two load-bearing claims: the portable
  * trailing-zero rho (the bit-trick both engines must agree on), and the
  * estimator/merge behavior of the register sketch itself.
  */
class HllSpec extends SparkSpec {
  import spark.implicits._

  test("portable trailing-zero rho equals numberOfTrailingZeros + 1, capped at 57") {
    val ws = Seq(0L, 1L, 2L, 3L, 4L, 96L, 1L << 20, 1L << 55, (1L << 56) - 1, 123456789L)
    val got = ws.toDF("w")
      .select(
        $"w",
        least(
          bit_count($"w".bitwiseAND(-$"w") - lit(1L)).cast("long") + lit(1L),
          lit(57L)
        ).as("rho")
      )
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (w <- ws) {
      val expected =
        if (w == 0L) 57L // bit_count(-1) = 64 saturates into the cap
        else math.min(java.lang.Long.numberOfTrailingZeros(w) + 1L, 57L)
      assert(got(w) == expected, s"w=$w")
    }
  }

  test("estimates track exact counts and the merged ALL sketch dominates members") {
    val out = Dedup.hllDistinct(spark, "/root/testdata/sf0.01").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("A", "ALL", "N", "R"))
    out.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact  = r.getLong(2).toDouble
      // m = 256 → rse ≈ 1.04/√256 = 6.5%; 3σ headroom on deterministic data
      assert(math.abs(approx - exact) / exact < 0.20,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
    // register-wise max ⇒ S can only shrink ⇒ the merged estimate is
    // exactly monotone: ALL ≥ every member scope
    val byScope = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byScope("ALL") >= Seq("A", "N", "R").map(byScope).max)
  }
}
