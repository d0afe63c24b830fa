package graft.queries

import graft.SparkSpec
import graft.syntax._
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the Catalyst feature that makes a
  * selective dim⋈fact shuffle join scale-safe when the dim side is too big
  * to broadcast: the optimizer builds a bloom filter from the filtered
  * creation side and injects might_contain on the fact side BEFORE its
  * shuffle, so non-matching fact rows never cross the exchange. At 100 TB
  * this is the difference between shuffling the whole fact table and
  * shuffling the ~selectivity fraction that can actually join. Thresholds
  * are lowered here because the test corpus is far below the production
  * defaults (10 MB creation side / 10 GB application side).
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim join injects a bloom might_contain below the fact shuffle") {
    val prev = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled", "false"),
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "10GB"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    )
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
      val part = Tables.part(spark, sf0001).filter($"p_brand" === "Brand#13")
      val li   = Tables.lineitem(spark, sf0001)
      val joined = li
        .join(part, $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(sum($"l_quantity").as("qty"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(
        plan.contains("might_contain") || plan.contains("bloom_filter"),
        s"no runtime bloom filter injected:\n$plan"
      )
      // semantics unchanged by the filter: same result as the plain join
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val expect = li
        .join(part, $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(sum($"l_quantity").as("qty"))
        .collect().map(_.toSeq).toSeq
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      assert(joined.collect().map(_.toSeq).toSeq == expect)
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
