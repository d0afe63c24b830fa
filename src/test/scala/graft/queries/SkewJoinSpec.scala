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

  test("AQE runtime skew split handles the same hot key (when manual salting is NOT needed)") {
    import spark.implicits._
    // One hot key carrying ~90% of the big side. With the skew thresholds
    // lowered to test scale and broadcast disabled (forcing the shuffle
    // join AQE's skew rule targets), the runtime re-plan must split the
    // oversized partition: the final adaptive plan shows a skew-handled
    // shuffle read. This is the path every graft session already enables
    // (GraftSession: adaptive.enabled=true) — saltedInnerJoin exists for
    // the cases AQE can't cover, see scaladoc.
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      val big = spark
        .range(200000)
        .select(
          when($"id" % 10 === 0, concat(lit("cold"), ($"id" % 97).cast("string")))
            .otherwise(lit("hot")).as("k"),
          rpad($"id".cast("string"), 32, "x").as("payload")
        )
      val small = (Seq("hot") ++ (0 until 97).map(i => s"cold$i")).toDF("k")
        .withColumn("name", concat(lit("dim_"), $"k"))
      // collect() (not count()) so the adaptive plan we inspect is the
      // one that ran: count() spawns its own QueryExecution
      val joined = big.join(small, Seq("k"), "inner")
      val n = joined.collect().length
      assert(n == 200000)
      // the materialized adaptive plan must contain a shuffle read whose
      // partitionSpecs include a PartialReducerPartitionSpec — the node
      // AQE inserts when it splits a skewed partition. Typed assertion,
      // not a toString substring: survives display-format renames and
      // can't false-positive on an unrelated plan node.
      import org.apache.spark.sql.execution.{PartialReducerPartitionSpec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec, QueryStageExec}
      val adaptive = joined.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }.getOrElse(fail("no AdaptiveSparkPlanExec root in executed plan"))
      // manual recursion: QueryStageExec holds its subtree in `.plan`, not
      // in `children`, so a plain collect() stops at stage boundaries
      def reads(p: SparkPlan): Seq[AQEShuffleReadExec] = {
        val here = p match { case r: AQEShuffleReadExec => Seq(r); case _ => Nil }
        val kids = p match { case q: QueryStageExec => Seq(q.plan); case _ => p.children }
        here ++ kids.flatMap(reads)
      }
      assert(
        reads(adaptive.executedPlan)
          .exists(_.partitionSpecs.exists(_.isInstanceOf[PartialReducerPartitionSpec])),
        s"no skew-split AQEShuffleRead in plan:\n${adaptive.executedPlan}"
      )
      // and the salted fallback computes the identical result
      val salted = SkewJoin.saltedInnerJoin(big, small, "k", salts = 8)
      assert(salted.count() == n)
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
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
