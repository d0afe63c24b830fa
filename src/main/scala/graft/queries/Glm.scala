package graft.queries

import graft.tables.Tables
import graft.syntax._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Logistic regression trained IN the engine by iteratively reweighted
  * least squares (IRLS / Newton–Raphson) — the canonical distributed-GLM
  * pattern: each iteration is ONE map-side-combinable aggregate that
  * ships 14 numbers (the upper triangle of the 4×4 weighted Gram matrix
  * XᵀWX plus the gradient Xᵀ(y−p)), the driver solves the 4×4 system and
  * broadcasts the updated β as literals into the next pass. The corpus
  * never shuffles at all — every pass is scan → partial-agg → final-agg
  * of a fixed-size state, the shape that holds unchanged at 100 TB
  * (model dimension, not data volume, bounds the state).
  *
  * Cross-engine determinism, layer by layer:
  *  - features are single-rounding IEEE transforms of exact columns
  *    (quantity/50, 10·discount, 10·tax), identical in any engine;
  *  - p = σ(xβ) is the one libm call; it is once-rounded at 7 dp, where
  *    a last-ULP exp() disagreement flips the grid with probability
  *    ~10⁻⁹ per row (ULP of p·10⁷ ≈ 10⁻⁹ vs a unit grid);
  *  - every per-row Gram/gradient/deviance term is once-rounded at 9 dp
  *    into DECIMAL(20,9) and decimal-summed — order-free, and the sums
  *    stay under 2⁵³ quanta so BOTH engines' decimal→double casts are
  *    EXACT (no int128 two-rounding hazard);
  *  - the Newton step solves H·δ = g by Cramer's rule through cofactor
  *    expressions whose evaluation tree is GENERATED ONCE and rendered
  *    twice — as driver-side Scala doubles and as the oracle's SQL — so
  *    both engines run the identical IEEE op sequence and β matches
  *    bit-for-bit at every iteration.
  *
  * y = (l_returnflag = 'R'), base rate ≈ ¼, weakly separated features →
  * fitted probabilities sit far from 0/1, keeping the final deviance's
  * ln() terms finite (GlmSpec pins the p range).
  */
object Glm {
  type Q = (SparkSession, String) => DataFrame

  val irlsIters = 4
  private val dec = DecimalType(20, 9)

  // ---------------------------------------------------------------- shared
  // Cramer cofactor trees, rendered for both evaluators. The ONLY rule:
  // det3Num and det3Sql (resp. det4) must keep the same association
  // order — Scala does not reassociate doubles and SQL engines do not
  // reassociate explicit parentheses, so same tree ⇒ same bits.

  private def det3Num(m: Array[Array[Double]]): Double = {
    val a = m(0)(0); val b = m(0)(1); val c = m(0)(2)
    val d = m(1)(0); val e = m(1)(1); val f = m(1)(2)
    val g = m(2)(0); val h = m(2)(1); val i = m(2)(2)
    a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
  }

  private def det3Sql(m: Array[Array[String]]): String = {
    val a = m(0)(0); val b = m(0)(1); val c = m(0)(2)
    val d = m(1)(0); val e = m(1)(1); val f = m(1)(2)
    val g = m(2)(0); val h = m(2)(1); val i = m(2)(2)
    s"($a * ($e * $i - $f * $h) - $b * ($d * $i - $f * $g) + $c * ($d * $h - $e * $g))"
  }

  private def minor[T: scala.reflect.ClassTag](m: Array[Array[T]], col: Int): Array[Array[T]] =
    Array.tabulate(3, 3)((r, c) => m(r + 1)(Seq(0, 1, 2, 3).filter(_ != col)(c)))

  private def det4Num(m: Array[Array[Double]]): Double =
    m(0)(0) * det3Num(minor(m, 0)) - m(0)(1) * det3Num(minor(m, 1)) +
      m(0)(2) * det3Num(minor(m, 2)) - m(0)(3) * det3Num(minor(m, 3))

  private def det4Sql(m: Array[Array[String]]): String =
    s"(${m(0)(0)} * ${det3Sql(minor(m, 0))} - ${m(0)(1)} * ${det3Sql(minor(m, 1))}" +
      s" + ${m(0)(2)} * ${det3Sql(minor(m, 2))} - ${m(0)(3)} * ${det3Sql(minor(m, 3))})"

  /** β_new = β + H⁻¹g via Cramer, numeric side. h is the 10-entry upper
    * triangle row-major, g the 4 gradient sums.
    */
  private[queries] def newtonStep(beta: Array[Double], h: Array[Double], g: Array[Double]): Array[Double] = {
    def hm(i: Int, j: Int): Double = {
      val (a, b) = if (i <= j) (i, j) else (j, i)
      h(Seq(0, 4, 7, 9)(a) + (b - a))
    }
    val hFull = Array.tabulate(4, 4)(hm)
    val dH = det4Num(hFull)
    Array.tabulate(4) { i =>
      val hi = Array.tabulate(4, 4)((r, c) => if (c == i) g(r) else hFull(r)(c))
      beta(i) + det4Num(hi) / dH
    }
  }

  /** Same step, SQL side: expressions over columns h00..h33 / g0..g3 of
    * the iteration CTE and b0..b3 of the previous beta CTE.
    */
  private def newtonStepSql(prev: String, it: String): String = {
    def hm(i: Int, j: Int): String = { val (a, b) = if (i <= j) (i, j) else (j, i); s"$it.h$a$b" }
    val hFull = Array.tabulate(4, 4)((i, j) => hm(i, j))
    val dH = det4Sql(hFull)
    (0 until 4).map { i =>
      val hi = Array.tabulate(4, 4)((r, c) => if (c == i) s"$it.g$r" else hFull(r)(c))
      s"$prev.b$i + ${det4Sql(hi)} / $dH AS b$i"
    }.mkString(",\n    ")
  }

  // ---------------------------------------------------------------- engine

  // the feature transforms are bit-identical cross-engine BECAUSE the
  // source columns are parquet DOUBLEs — both engines compute
  // fl(fl(d)·10) etc. (a DECIMAL-typed corpus would make the oracle's
  // decimal-first multiply diverge by one ulp on values like 0.07)
  private def feats(s: SparkSession, d: String): DataFrame =
    Tables
      .lineitem(s, d)
      .select(
        ($"l_quantity".cast("double") / lit(50.0)).as("x1"),
        ($"l_discount".cast("double") * lit(10.0)).as("x2"),
        ($"l_tax".cast("double") * lit(10.0)).as("x3"),
        ($"l_returnflag" === "R").cast("int").cast("double").as("y")
      )

  private def pCol(beta: Array[Double]): Column = {
    val xb = lit(beta(0)) + lit(beta(1)) * $"x1" + lit(beta(2)) * $"x2" + lit(beta(3)) * $"x3"
    round(lit(1.0) / (lit(1.0) + exp(-xb)), 7)
  }

  val logitIrls: Q = (s, d) => {
    // Scale-adaptive spread before the iterative passes (r14 optimization
    // round, guide §2.6 idle capacity): the 4 IRLS passes + the deviance
    // pass are CPU-bound re-scans of this persisted table (18 round()+
    // decimal casts per row per pass), so its PARTITIONING caps the whole
    // query's parallelism. A small corpus is row-group-bound (sf0.1:
    // 3 splits → 3 of 32 cores busy; measured 31.5 s in the full sweep);
    // paying ONE narrow-row shuffle to spread it measured ~10× (3.2 s,
    // ProfileQ min-of-2). When the
    // scan already fills the cluster (the 100 TB case) the condition is
    // false and no shuffle is added. Decimal sums are order-free, so the
    // repartition cannot change any aggregate.
    val f = feats(s, d).spreadAcrossCores().persist()
    try {
      var beta = Array(0.0, 0.0, 0.0, 0.0)
      val xs: Array[Column] = Array(lit(1.0), $"x1", $"x2", $"x3")
      for (_ <- 1 to irlsIters) {
        val p = pCol(beta)
        val w = p * (lit(1.0) - p)
        val hCols = for { i <- 0 until 4; j <- i until 4 }
          yield sum(round(w * xs(i) * xs(j), 9).cast(dec)).as(s"h$i$j")
        val gCols = (0 until 4).map(i => sum(round(($"y" - p) * xs(i), 9).cast(dec)).as(s"g$i"))
        val all = hCols ++ gCols
        val r = f.agg(all.head, all.tail: _*).head()
        val h = Array.tabulate(10)(k => r.getDecimal(k).doubleValue)
        val g = Array.tabulate(4)(k => r.getDecimal(10 + k).doubleValue)
        beta = newtonStep(beta, h, g)
      }
      val p = pCol(beta)
      val devTerm = round(when($"y" === 1.0, log(p)).otherwise(log(lit(1.0) - p)), 9).cast(dec)
      val correct = (($"y" === 1.0) === (p > lit(0.5))).cast("long")
      f.agg(
          count(lit(1)).as("n"),
          sum(devTerm).as("s"),
          sum(correct).as("n_correct")
        )
        .select(
          lit(round2(beta(0))).as("b0"),
          lit(round2(beta(1))).as("b1"),
          lit(round2(beta(2))).as("b2"),
          lit(round2(beta(3))).as("b3"),
          round(lit(-2.0) * $"s".cast("double"), 6).as("deviance"),
          $"n",
          $"n_correct"
        )
    } finally f.unpersist()
  }

  /** round-half-up at 6 dp on the decimal expansion — Spark's round()
    * semantics, applied driver-side so β lands in the output via lit().
    */
  private def round2(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  // ---------------------------------------------------------------- oracle

  private val featsSql =
    """feats AS (
      |  SELECT CAST(l_quantity AS DOUBLE) / 50.0 AS x1,
      |    l_discount * 10.0 AS x2,
      |    l_tax * 10.0 AS x3,
      |    CAST(CAST(l_returnflag = 'R' AS INT) AS DOUBLE) AS y
      |  FROM lineitem)""".stripMargin

  private def pSql(b: String): String =
    s"round(1.0 / (1.0 + exp(-($b.b0 + $b.b1 * x1 + $b.b2 * x2 + $b.b3 * x3))), 7)"

  private def iterSql(it: String, prev: String): String = {
    val xsS = Array("1.0", "x1", "x2", "x3")
    val hs = (for { i <- 0 until 4; j <- i until 4 }
      yield s"CAST(SUM(CAST(round(w * ${xsS(i)} * ${xsS(j)}, 9) AS DECIMAL(20,9))) AS DOUBLE) AS h$i$j")
      .mkString(",\n    ")
    val gs = (0 until 4)
      .map(i => s"CAST(SUM(CAST(round((y - p) * ${xsS(i)}, 9) AS DECIMAL(20,9))) AS DOUBLE) AS g$i")
      .mkString(",\n    ")
    s"""$it AS (
      |  SELECT
      |    $hs,
      |    $gs
      |  FROM (
      |    SELECT x1, x2, x3, y, p, p * (1.0 - p) AS w
      |    FROM (SELECT feats.*, ${pSql(prev)} AS p FROM feats CROSS JOIN $prev) q0) q1)""".stripMargin
  }

  // Spark's decimal sums surface as DOUBLE via exact casts (< 2^53
  // quanta); DuckDB's DECIMAL(38,9)→DOUBLE is equally exact there, so
  // the h/g columns enter the Cramer tree bit-identical. Each beta CTE
  // is the generated Newton step over the previous one.
  val oracleSql: String = {
    val chain = new StringBuilder
    chain ++= s"WITH $featsSql,\n"
    chain ++= "b_init AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2, 0.0 AS b3),\n"
    var prev = "b_init"
    for (k <- 1 to irlsIters) {
      val it = s"it$k"; val bk = s"beta$k"
      chain ++= iterSql(s"$it", prev) + ",\n"
      chain ++= s"""$bk AS (
        |  SELECT
        |    ${newtonStepSql(prev, it)}
        |  FROM $it CROSS JOIN $prev),
        |""".stripMargin
      prev = s"beta$k"
    }
    val b = s"beta$irlsIters"
    chain ++= s"""fin AS (
      |  SELECT feats.*, ${pSql(b)} AS p FROM feats CROSS JOIN $b),
      |agg AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(round(CASE WHEN y = 1.0 THEN ln(p) ELSE ln(1.0 - p) END, 9)
      |      AS DECIMAL(20,9))) AS s,
      |    CAST(SUM(CAST((y = 1.0) = (p > 0.5) AS BIGINT)) AS BIGINT) AS n_correct
      |  FROM fin)
      |SELECT round($b.b0, 6) AS b0, round($b.b1, 6) AS b1,
      |  round($b.b2, 6) AS b2, round($b.b3, 6) AS b3,
      |  round(-2.0 * CAST(s AS DOUBLE), 6) AS deviance, n, n_correct
      |FROM agg CROSS JOIN $b""".stripMargin
    chain.toString
  }

  val queries: Map[String, Q]      = Map("m_logit_irls" -> logitIrls)
  val oracles: Map[String, String] = Map("m_logit_irls" -> oracleSql)
}
