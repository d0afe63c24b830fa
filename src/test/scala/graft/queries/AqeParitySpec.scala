package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row

/** AQE on/off parity for the headline queries plus every query that
  * rides a custom operator (TopKPerKeyExec rewrite, salted skew join,
  * bloom runtime-filter prune): at fleet scale AQE re-plans exchanges at
  * runtime (partition coalescing, skew splitting, join-strategy swaps),
  * and a custom SparkPlan that mishandles a re-planned child would
  * silently change RESULTS, not just speed. The oracle gate runs one AQE
  * setting; this pins the other.
  *
  * Comparison is structural, not stringly (r11 review: a fixed-precision
  * format is a rounding CLIFF — two sums a rounding boundary apart format
  * differently at any precision — and toString on arrays compares object
  * identity): rows are bucketed by their non-floating cells, then matched
  * within each bucket under a 1e-9 relative tolerance for Double/Float,
  * recursing into nested Seq/Row/Array values. AQE changes partition
  * counts and therefore float summation ORDER — ~1e-12 relative drift is
  * legitimate; anything at 1e-9 is a real divergence.
  */
class AqeParitySpec extends SparkSpec {

  private val names: Seq[String] =
    (graft.Bench.headline ++ Seq(
      "o_topk_sql_rewrite", // TopKRewrite → TopKPerKeyExec
      "j_salted_dim",       // SkewJoin.saltedInnerJoin
      "j_bloom_prune",      // bloom runtime filter
      "dedup_incremental_bloom",
      "w1_window_min"
    )).distinct

  private def relClose(x: Double, y: Double): Boolean =
    (x.isNaN && y.isNaN) || x == y ||
      math.abs(x - y) <= 1e-9 * math.max(1.0, math.max(math.abs(x), math.abs(y)))

  private def eqVal(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null)                     => true
    case (null, _) | (_, null)            => false
    case (x: Double, y: Double)           => relClose(x, y)
    case (x: Float, y: Float)             => relClose(x.toDouble, y.toDouble)
    case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
    case (x: Array[_], y: Array[_])       => x.length == y.length && x.iterator.zip(y.iterator).forall(t => eqVal(t._1, t._2))
    case (x: Seq[_], y: Seq[_])           => x.length == y.length && x.iterator.zip(y.iterator).forall(t => eqVal(t._1, t._2))
    case (x: Map[_, _], y: Map[_, _])     => x.size == y.size && x.asInstanceOf[Map[Any, Any]].forall { case (k, v) => y.asInstanceOf[Map[Any, Any]].get(k).exists(eqVal(v, _)) }
    case (x: Row, y: Row)                 => x.length == y.length && (0 until x.length).forall(i => eqVal(x.get(i), y.get(i)))
    case _                                => a == b
  }

  /** Bucket key from the non-floating cells — stable across AQE's float
    * summation-order drift, discriminating enough that buckets are tiny.
    */
  private def bucketKey(r: Row): String =
    (0 until r.length).map { i =>
      r.get(i) match {
        case _: Double | _: Float | _: Array[_] | _: Seq[_] | _: Map[_, _] | _: Row => "·"
        case null => "∅"
        case x    => x.toString
      }
    }.mkString("|")

  /** Greedy tolerance-matching per bucket: every on-row must claim a
    * distinct off-row that matches cell-for-cell under eqVal.
    */
  private def matchRows(name: String, on: Array[Row], off: Array[Row]): Unit = {
    assert(on.length == off.length, s"$name: AQE on/off row counts differ (${on.length} vs ${off.length})")
    val onB  = on.groupBy(bucketKey)
    val offB = off.groupBy(bucketKey)
    assert(onB.keySet == offB.keySet, s"$name: AQE on/off bucket keys differ")
    onB.foreach { case (k, rows) =>
      val pool = scala.collection.mutable.ArrayBuffer.from(offB(k))
      assert(pool.length == rows.length, s"$name: bucket '$k' sizes differ")
      rows.foreach { r =>
        val i = pool.indexWhere(o => eqVal(r, o))
        assert(i >= 0, s"$name: no AQE-off row matches $r in bucket '$k'")
        pool.remove(i)
      }
    }
  }

  test("headline + custom-operator queries return identical rows with AQE off") {
    // SEQUENTIAL-EXECUTION DEPENDENCY (r11 ADVICE): this toggles
    // spark.sql.adaptive.enabled on the JVM-shared session, which is
    // safe only because sbt runs forked suites sequentially
    // (testForkedParallel defaults to false). Enabling parallel suite
    // execution would run other suites' queries with AQE off mid-test —
    // if that ever changes, route config-mutating suites through a
    // shared session-level lock (or a private SparkSession.newSession).
    val conf = spark.conf
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val on =
        try fn(spark, sf0001).collect()
        finally spark.catalog.clearCache()
      assert(conf.get("spark.sql.adaptive.enabled") == "true", "expected AQE on by default")
      conf.set("spark.sql.adaptive.enabled", "false")
      val off =
        try fn(spark, sf0001).collect()
        finally {
          spark.catalog.clearCache()
          conf.set("spark.sql.adaptive.enabled", "true")
        }
      matchRows(name, on, off)
    }
  }
}
