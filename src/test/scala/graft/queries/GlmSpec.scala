package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GlmSpec extends SparkSpec {

  test("newton step: identity Gram matrix makes the step exactly the gradient") {
    // H = I (upper triangle [1,0,0,0, 1,0,0, 1,0, 1]), g arbitrary
    val beta = Array(1.0, -2.0, 0.5, 0.0)
    val g    = Array(0.25, -0.125, 3.0, -1.5)
    val h    = Array(1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 1.0, 0.0, 1.0)
    val out  = Glm.newtonStep(beta, h, g)
    (0 until 4).foreach(i => assert(out(i) == beta(i) + g(i), s"component $i: ${out(i)}"))
  }

  test("newton step: diagonal Gram matrix divides the gradient componentwise") {
    val beta = Array(0.0, 0.0, 0.0, 0.0)
    val g    = Array(2.0, 9.0, -4.0, 10.0)
    val h    = Array(2.0, 0.0, 0.0, 0.0, 3.0, 0.0, 0.0, 4.0, 0.0, 5.0)
    val out  = Glm.newtonStep(beta, h, g)
    assert(out.toSeq == Seq(1.0, 3.0, -1.0, 2.0), out.toSeq.toString)
  }

  test("logit IRLS: intercept lands near the base-rate logit and the fit beats nothing") {
    val r = Glm.logitIrls(spark, sf0001).head()
    val (b0, dev, n, nc) = (r.getDouble(0), r.getDouble(4), r.getLong(5), r.getLong(6))
    val base = graft.tables.Tables.lineitem(spark, sf0001)
      .agg(avg((col("l_returnflag") === "R").cast("int").cast("double"))).head().getDouble(0)
    val logit = math.log(base / (1 - base))
    // weakly-informative features → the intercept carries the base rate
    assert(math.abs(b0 - logit) < 0.2, s"b0=$b0 vs base-rate logit $logit")
    assert(dev > 0 && !dev.isInfinite, s"deviance degenerate: $dev")
    // never worse than the majority-class predictor
    val majority = math.max(base, 1 - base)
    assert(nc.toDouble / n >= majority - 1e-9, s"accuracy ${nc.toDouble / n} below majority $majority")
    // deviance beats the null deviance −2·n·[q ln q + (1−q) ln(1−q)]
    val nullDev = -2.0 * n * (base * math.log(base) + (1 - base) * math.log(1 - base))
    assert(dev <= nullDev + 1e-6, s"deviance $dev above null $nullDev")
  }
}
