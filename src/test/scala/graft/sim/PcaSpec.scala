package graft.sim

import graft.SparkSpec
import graft.syntax._
import org.apache.spark.sql.functions._

/** Semantic invariants of the PCA cascade that the differential gate
  * cannot express: the eigenvector is unit-norm, the projections are
  * centered, and — the point of PCA — the leading component captures at
  * least as much variance as ANY single original dimension.
  */
class PcaSpec extends SparkSpec {

  private lazy val (mu, ev) = Pca.pcaComponents(spark, sf0001)
  private lazy val proj = Pca.pcaProject(spark, sf0001).collect().map(_.getDouble(1))

  test("eigenvector is unit norm, sign-fixed, 64-dimensional") {
    assert(ev.length == 64)
    val n2 = ev.map(x => x * x).sum
    assert(math.abs(n2 - 1.0) < 1e-6, s"norm² = $n2")
    val best = ev.indices.maxBy(i => math.abs(ev(i)))
    assert(ev(best) > 0, "largest-|coordinate| sign rule violated")
  }

  test("projections are mean-centered") {
    val mean = proj.sum / proj.length
    assert(math.abs(mean) < 1e-4, s"pc1 mean = $mean")
  }

  test("covariance stage: no join, one exchange, groups bounded by d(d+1)/2") {
    val df = Pca.covarianceFrame(spark, sf0001)
    val n  = df.collect().length
    assert(n == 64 * 65 / 2, s"expected 2080 upper-triangle cells, got $n")
    // descend through AQE wrappers so nodes inside query stages count
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, CartesianProductExec}
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case other                    => other.children
      }
      p +: kids.flatMap(walk)
    }
    val nodes = walk(df.queryExecution.executedPlan)
    assert(!nodes.exists(n => n.isInstanceOf[BaseJoinExec] || n.isInstanceOf[CartesianProductExec]),
      s"covariance build must not self-join:\n${df.queryExecution.executedPlan}")
    val exchanges = nodes.count(_.isInstanceOf[ShuffleExchangeLike])
    assert(exchanges == 1,
      s"expected exactly one exchange (the ≤2080-group agg shuffle), got $exchanges:\n${df.queryExecution.executedPlan}")
  }

  test("pc1 variance dominates every single original dimension's variance") {
    val n      = proj.length
    val pc1Var = proj.map(x => x * x).sum / n
    val dimVar = graft.tables.Tables
      .embeddings(spark, sf0001)
      .select(posexplode(transform($"embedding", _.cast("double"))).as(Seq("i", "x")))
      .groupBy($"i")
      .agg((sum($"x" * $"x") / count(lit(1)) -
        (sum($"x") / count(lit(1))) * (sum($"x") / count(lit(1)))).as("v"))
      .agg(max($"v"))
      .collect()(0)
      .getDouble(0)
    // small slack: projections use the 9dp-rounded eigenvector
    assert(pc1Var >= dimVar - 1e-6, s"pc1 var $pc1Var < max dim var $dimVar")
  }
}
