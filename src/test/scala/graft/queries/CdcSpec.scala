package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("mergeUpsert: delta wins on collision, inserts land, untouched base survives") {
    import spark.implicits._
    val base    = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val updates = Seq((2, "B"), (3, "C")).toDF("k", "v")
    val merged  = Cdc.mergeUpsert(base, updates, Seq("k"))
    assert(merged.orderBy($"k").as[(Int, String)].collect().toSeq ==
      Seq((1, "a"), (2, "B"), (3, "C")))
    // re-applying the same delta is a no-op (upsert idempotence)
    val twice = Cdc.mergeUpsert(merged, updates, Seq("k"))
    assert(twice.orderBy($"k").as[(Int, String)].collect().toSeq ==
      merged.orderBy($"k").as[(Int, String)].collect().toSeq)
  }

  test("w_merge_upsert: one row per key, both provenance classes present") {
    val df   = Cdc.wMergeUpsert(spark, sf0001)
    val rows = df.count()
    assert(df.select("c_custkey").distinct().count() == rows, "duplicate merge keys")
    val srcs = df.select("src").distinct().collect().map(_.getString(0)).toSet
    assert(srcs == Set("base", "delta"), s"unexpected provenance classes: $srcs")
  }

  test("w_snapshot_diff: classes partition the key space consistently with merge") {
    val diff = Cdc.wSnapshotDiff(spark, sf0001).cache()
    try {
      assert(diff.select("c_custkey").distinct().count() == diff.count())
      // added/changed keys are exactly the merge result's delta rows
      val deltaKeys = Cdc.wMergeUpsert(spark, sf0001)
        .filter(col("src") === "delta").select("c_custkey")
      val diffKeys = diff.filter(col("change_type").isin("added", "changed"))
        .select("c_custkey")
      assert(diffKeys.exceptAll(deltaKeys).count() == 0)
      assert(deltaKeys.exceptAll(diffKeys).count() == 0)
    } finally diff.unpersist()
  }

  test("e_scd2: intervals chain per user, exactly one current version") {
    val df = Cdc.eScd2(spark, sf0001).cache()
    try {
      // valid_to of version v equals valid_from of version v+1
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($("user_id")).orderBy($("version"))
      val broken = df
        .withColumn("next_from", lead(col("valid_from"), 1).over(w))
        .filter(col("valid_to").isNotNull && (col("valid_to") =!= col("next_from")))
        .count()
      assert(broken == 0, s"$broken non-chaining intervals")
      val multiCurrent = df
        .filter(col("is_current") === 1)
        .groupBy(col("user_id")).count().filter(col("count") =!= 1).count()
      assert(multiCurrent == 0, "users with != 1 current version")
      // islands are maximal: consecutive versions never share a status
      val unmerged = df
        .withColumn("next_status", lead(col("status"), 1).over(w))
        .filter(col("next_status").isNotNull && (col("status") === col("next_status")))
        .count()
      assert(unmerged == 0, s"$unmerged adjacent islands with equal status")
    } finally df.unpersist()
  }

  test("e_scd2 plan: windows and the island aggregate ride ONE hash exchange") {
    val p = plan(Cdc.eScd2(spark, sf0001))
    // one hashpartitioning(user_id) exchange feeds both window passes and
    // the (user_id, version) aggregate; the trailing orderBy adds its
    // range exchange — nothing else may shuffle (formatted mode prints
    // each node twice; count the "(n) Exchange" detail headers)
    val exchanges = p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange"""))
    assert(exchanges <= 2, s"SCD2 added a shuffle:\n$p")
    assert(p.contains("Window"), p)
  }

  private def $(name: String) = col(name)
}
