package graft.tools
import graft.GraftSession
import graft.tables.Tables
import org.apache.spark.sql.functions._
object ProfileRb2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "profile-rb2")
    import spark.implicits._
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](n: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"[rb2] $n: ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    for (_ <- 1 to 2) {
      val o = Tables.orders(spark, d)
        .filter($"o_custkey" % 20 === 0 && year($"o_orderdate") === 1997)
        .select($"o_orderkey", $"o_orderdate", trunc($"o_orderdate", "month").as("o_bin"))
      val liAll = Tables.lineitem(spark, d).select($"l_orderkey", $"l_shipdate", trunc($"l_shipdate", "month").as("l_bin"))
      val liPruned = Tables.lineitem(spark, d)
        .filter($"l_shipdate" >= lit("1997-01-01").cast("date") && $"l_shipdate" < lit("1998-02-01").cast("date"))
        .select($"l_orderkey", $"l_shipdate", trunc($"l_shipdate", "month").as("l_bin"))
      time("orders probe")(println("  n_orders=" + o.count()))
      time("li scan all")(println("  n_li=" + liAll.count()))
      time("li scan pruned")(println("  n_li_pruned=" + liPruned.count()))
      val expanded = o.select($"o_orderkey", $"o_orderdate",
        explode(array((0 to 2).map(k => add_months($"o_bin", k)): _*)).as("bin"))
      time("join product (pre-refine)")(println("  n_pairs=" + broadcast(expanded).join(liPruned, $"bin" === $"l_bin").count()))
      time("full query")(graft.queries.Relational.jRangeBinned(spark, d).count())
    }
    spark.stop()
  }
}
