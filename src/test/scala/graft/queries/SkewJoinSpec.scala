package graft.queries

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join result equals plain join result") {
    val li = Tables.lineitem(spark, sf0001)
    val p  = Tables.part(spark, sf0001)
    val plain = li
      .join(p, li("l_partkey") === p("p_partkey"))
      .groupBy("p_brand")
      .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    val salted = SkewJoin
      .saltedInnerJoin(li.withColumnRenamed("l_partkey", "p_partkey"), p, "p_partkey", salts = 7)
      .groupBy("p_brand")
      .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    assert(salted == plain)
  }

  test("salt spreads a bit-identical hot key across buckets") {
    import spark.implicits._
    // 1000 identical rows — the worst-case hot key; join against a
    // 1-row small side and check the salted join still matches
    val hot   = Seq.fill(1000)(("k1", 1.0)).toDF("k", "v")
    val small = Seq(("k1", "dim")).toDF("k", "name")
    val out = SkewJoin.saltedInnerJoin(hot, small, "k", salts = 8)
    assert(out.count() == 1000)
    val spread = hot
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(8L)))
      .select("__salt")
      .distinct()
      .count()
    assert(spread > 1)
  }
}
