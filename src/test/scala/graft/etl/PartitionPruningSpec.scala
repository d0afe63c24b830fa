package graft.etl

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.Files

/** Date-partitioned layout: a time-range filter must become a partition
  * filter (pruned at planning), not a data filter over a full scan.
  */
class PartitionPruningSpec extends SparkSpec {

  test("date-range query prunes partitions on a date-partitioned fact table") {
    val dir = Files.createTempDirectory("graft-part").toString + "/li"
    val li = Tables
      .lineitem(spark, sf0001)
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
    Warehouse.writeDatePartitioned(li, dir, "ship_month")

    val q = spark.read
      .parquet(dir)
      .filter(col("ship_month") === "1997-03")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("q"))
    val plan = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val partLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(partLine.contains("ship_month"), s"no partition filter:\n$plan")

    // pruning is real: only the matching month's rows are read
    val expected = Tables
      .lineitem(spark, sf0001)
      .filter(date_format(col("l_shipdate"), "yyyy-MM") === "1997-03")
      .count()
    assert(spark.read.parquet(dir).filter(col("ship_month") === "1997-03").count() == expected)
    assert(expected > 0)
  }
}
