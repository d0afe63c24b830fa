package graft.queries

import graft.SparkSpec
import graft.forecast.ForecastJobs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan assertions — the scale-readiness contract. Each test
  * pins a property that must survive refactors because it is what makes
  * the plan work at 100 TB: filters and projections reaching the parquet
  * scan, dimensions broadcast instead of shuffled, whole-stage codegen
  * covering the hot path.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("F7: filter is pushed to the parquet scan") {
    val p = plan(Relational.f7FilterRange(spark, sf0001))
    assert(p.contains("PushedFilters:"), p)
    assert(
      p.contains("EqualTo(o_orderstatus,F)") || p.contains("IsNotNull(o_orderstatus)"),
      s"order-status filter not pushed:\n$p"
    )
  }

  test("F5: column pruning — scan reads only the projected columns") {
    val p = plan(Relational.f5Projection(spark, sf0001))
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_returnflag"))
    assert(!readSchema.contains("l_extendedprice"), s"scan reads unprojected column:\n$readSchema")
  }

  test("J2: dimension joins are broadcast, fact side never shuffles for the join") {
    val p = plan(Relational.j2DimJoin(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("Q1: aggregation is partial (map-side) before the exchange") {
    val p = plan(Relational.q1PricingSummary(spark, sf0001))
    // two HashAggregates around one Exchange = partial + final
    val aggCount = p.linesIterator.count(_.contains("HashAggregate"))
    assert(aggCount >= 2, s"no partial aggregation:\n$p")
    // simple-mode plan marks codegen stages with *(n); AQE only shows the
    // final plan (with codegen spans) after execution
    val df = Relational.q1PricingSummary(spark, sf0001)
    df.collect()
    val simple = df.queryExecution.executedPlan.toString
    assert(simple.contains("*("), s"hot path fell out of codegen:\n$simple")
  }

  test("weekly series: broadcast dim join + single shuffle for the rollup") {
    val df = ForecastJobs.weeklySeries(spark, sf0001, minWeeks = 5)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("S10 watermark scan: timestamp range filter reaches the scan") {
    val p = plan(Relational.s10WatermarkScan(spark, sf0001))
    assert(p.contains("PushedFilters:"), p)
  }

  test("textRareScore: no single-partition window, no vocab broadcast (round-2 scale fix)") {
    // at sf0.001 the vocab is tiny and Spark would AUTO-broadcast it,
    // which at 100 TB it cannot — judge the plan shape with the
    // size-based broadcast decision off
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.text.TextAnalysis.textRareScore(spark, sf0001)
      val p  = plan(df)
      assert(!p.contains("Window"), s"global rank window crept back:\n$p")
      // the token join must be a shuffle join — a billion-token vocab is
      // never broadcastable (no explicit broadcast() hint in the query)
      assert(!p.contains("BroadcastHashJoin"), s"vocab side broadcast again:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("textCorpusProfile: vocab via two-level distinct agg, no collect_list (round-2 scale fix)") {
    val df = graft.text.TextAnalysis.textCorpusProfile(spark, sf0001)
    val p  = plan(df)
    assert(!p.contains("collect_list"), s"per-stratum token arrays crept back:\n$p")
    assert(p.contains("distinct"), p)
  }

  test("pipe_curate: single corpus scan (window dedup, no self-join re-scan)") {
    val p = plan(graft.text.Chunking.pipeCurate(spark, sf0001))
    // count scan NODES (detail headers "(n) Scan parquet"), not every
    // mention — the formatted output repeats each node in the detail list
    val scans = p.linesIterator.count(_.trim.matches("""\(\d+\) Scan parquet.*"""))
    assert(scans == 1, s"curation pipeline scans the corpus $scans times:\n$p")
  }

  test("text_mixture_sample: corpus never shuffles — rates broadcast, accept is map-only") {
    // simple-mode toString: exchanges print as one line there, so the
    // no-hash-exchange assertion actually bites (formatted mode splits
    // the node header from its hashpartitioning arguments)
    val p = graft.text.TextAnalysis.textMixtureSample(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"rates side not broadcast:\n$p")
    // the only exchanges allowed are the broadcast and the final sort —
    // a hash exchange would mean the corpus itself is being shuffled
    assert(!p.contains("Exchange hashpartitioning"), s"corpus shuffled:\n$p")
  }

  test("a_cms_heavy: counter build partial-aggregates map-side (fixed-size sketch state)") {
    val p = graft.queries.Advanced.aCmsHeavy(spark, sf0001)
      .queryExecution.executedPlan.toString
    // anchor on the COUNTERS aggregate (keys j, b) — the exact-top-10
    // branch also plans a partial_count and must not satisfy this test
    val counterPartial = p.linesIterator.exists(l =>
      l.contains("partial_count") && l.contains("keys=[j#") && l.contains("b#"))
    assert(counterPartial, s"counter build lost its map-side partial stage:\n$p")
  }

  test("a_quantile_sketch: bottom-k rides the native TopK partial trim") {
    val df = graft.queries.Advanced.aQuantileSketch(spark, sf0001)
    val p  = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKeyPartial"), s"no map-side partial trim:\n$p")
  }

  test("pipe_decontaminate: gram index join is a shuffle join; cap is a window, not a groupBy+join (round-3)") {
    // the 8-gram inverted index is corpus-sized — never broadcastable;
    // judge the shape with the size-based broadcast decision off
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan(graft.text.Chunking.pipeDecontaminate(spark, sf0001))
      assert(!p.contains("BroadcastHashJoin"), s"gram index broadcast:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      // the hot-bucket cap must ride a window on the join key's shuffle —
      // a groupBy+count+join formulation pays two extra shuffles (the
      // round-2 dedup_minhash_pairs regression, fixed round 3)
      assert(p.contains("Window"), s"bucket cap lost its window form:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("a_unpivot: melt is an Expand below ONE exchange — no shuffle added to the agg's") {
    val p = plan(Advanced.aUnpivot(spark, sf0001))
    assert(p.contains("Expand"), s"unpivot lost its Expand form:\n$p")
    // the feeding aggregation's exchange plus the final global sort's
    // range exchange; the melt itself must not add one (formatted mode
    // prints each node twice — count the "(n) Exchange" detail headers)
    val exchanges = p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange"""))
    assert(exchanges <= 2, s"unpivot added a shuffle:\n$p")
  }

  test("j_scalar_subquery: correlated subqueries decorrelate to aggregate+join, no per-row subquery") {
    val p = plan(Advanced.jScalarSubquery(spark, sf0001))
    assert(!p.contains("ScalarSubquery"), s"per-row scalar subquery survived:\n$p")
    assert(p.contains("HashAggregate"), p)
    assert(
      p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin"),
      s"no join produced by decorrelation:\n$p"
    )
  }

  test("o_top_n: global ORDER BY + LIMIT plans TakeOrderedAndProject, not a full sort") {
    val p = plan(Relational.oTopN(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"), s"top-N fell back to a full sort:\n$p")
    assert(!p.linesIterator.exists(_.trim.matches("""\(\d+\) Sort""")),
      s"a global Sort node crept in:\n$p")
  }

  test("text_bm25_topk: per-probe top-k rides the native bounded-heap TopK, df broadcasts") {
    val p = plan(graft.text.Retrieval.bm25TopKBuild(spark, sf0001, checkpoint = false))
    assert(p.contains("TopKPerKeyPartial"), s"BM25 lost the partial-trim top-k:\n$p")
    assert(p.contains("BroadcastExchange"), s"df table not broadcast:\n$p")
  }

  test("text_nb_classifier: model and class tables broadcast — scoring never shuffles the corpus side for the joins") {
    val p = plan(graft.text.TextAnalysis.nbClassifierBuild(spark, sf0001, checkpoint = false))
    val broadcasts = p.linesIterator.count(_.trim.matches("""\(\d+\) BroadcastExchange"""))
    assert(broadcasts >= 2, s"NB model/class tables not broadcast ($broadcasts):\n$p")
    assert(!p.contains("CartesianProduct"), s"class fan-out degenerated to a cartesian:\n$p")
  }

  test("m_logit_irls: the sufficient-statistics pass partial-aggregates map-side") {
    val p = plan(graft.queries.Glm.logitIrls(spark, sf0001))
    // two HashAggregate nodes (partial + final) around one single-row exchange
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("g_adamic_adar: the seed set broadcasts into the wedge join") {
    // the shipped query collapses to a K-row local relation (topKRanked
    // bounded fetch), so the wedge-join plan is asserted on the lazy
    // candidate relation it ranks
    val p = plan(graft.queries.Graph.adamicAdarCandidates(
      spark, sf0001, graft.queries.Graph.coEdges(spark, sf0001)))
    assert(p.contains("BroadcastExchange"), s"seed set not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }
}
