package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.SaveMode

/** S5/S7 JDBC source/sink against an embedded Derby database — a real
  * relational store in the loop (the closest in-container stand-in for
  * the reference's Postgres warehouse; only the URL differs).
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("writeJdbc + readJdbc roundtrip a warehouse table") {
    val df = Seq(("p1", 10.5, 1L), ("p2", 20.0, 2L), ("p3", 30.25, 3L))
      .toDF("payment_id", "dollars", "seq")
    Warehouse.writeJdbc(df, url, "square_trans_jdbc", SaveMode.Overwrite)
    val back = Warehouse.readJdbc(spark, url, "square_trans_jdbc")
    assert(back.count() == 3)
    assert(back.columns.map(_.toLowerCase).sorted.toSeq == Seq("dollars", "payment_id", "seq"))
    val m = back.collect().map(r => r.getAs[String]("payment_id") -> r.getAs[Double]("dollars")).toMap
    assert(m == Map("p1" -> 10.5, "p2" -> 20.0, "p3" -> 30.25))
  }

  test("append mode accumulates like the incremental load path") {
    val t = "append_jdbc"
    Warehouse.writeJdbc(Seq(("a", 1L)).toDF("k", "seq"), url, t, SaveMode.Overwrite)
    Warehouse.writeJdbc(Seq(("b", 2L)).toDF("k", "seq"), url, t, SaveMode.Append)
    assert(Warehouse.readJdbc(spark, url, t).count() == 2)
  }

  test("partitioned read splits the scan into parallel range queries") {
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("seq", "v")
    Warehouse.writeJdbc(df, url, "part_jdbc", SaveMode.Overwrite)
    val back = Warehouse.readJdbcPartitioned(
      spark, url, "part_jdbc",
      partitionColumn = "seq", lowerBound = 1L, upperBound = 101L, numPartitions = 4)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 100)
    assert(back.agg(org.apache.spark.sql.functions.sum($"seq")).head.getLong(0) == 5050L)
  }

  test("predicate pushdown reaches the JDBC source") {
    val back = Warehouse.readJdbc(spark, url, "part_jdbc").filter($"seq" > 90)
    assert(back.count() == 10)
    val p = back.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("seq"), p)
  }
}
