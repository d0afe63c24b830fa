package graft.functions

import graft.SparkSpec

/** The SQL-string surface of the native expressions: after register(),
  * `spark.sql("... hamming64(...) / cosine64(...)")` resolves like a
  * built-in — the path a SQL-only user of the library takes.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("hamming64 and cosine64 resolve and compute through spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT hamming64(CAST(5 AS BIGINT), CAST(6 AS BIGINT)) AS h,
        |  cosine64(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c_orth,
        |  cosine64(array(2.0D, 0.0D), array(1.0D, 0.0D)) AS c_par
        |""".stripMargin).collect()(0)
    assert(r.getInt(0) == 2)        // 101 xor 110 = 011
    assert(r.getDouble(1) == 0.0)   // orthogonal
    assert(r.getDouble(2) == 1.0)   // parallel
  }

  test("bigrams resolves and computes through spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT bigrams('a b c') AS bg, bigrams('one') AS none").collect()(0)
    assert(r.getSeq[String](0) == Seq("a b", "b c"))
    assert(r.getSeq[String](1) == Seq.empty)
  }

  test("wrong-typed argument fails at ANALYSIS time with a clean error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT hamming64('not a long', 1L)").collect()
    }
    // analysis-time type error (ExpectsInputTypes), not a runtime
    // ClassCastException from deep inside an executor task
    assert(!e.isInstanceOf[ClassCastException], e.getClass.getName)
  }
}
