package graft.tools

/** Prints the driver-facing query inventory: total queries, oracle
  * coverage, and the rows-only remainder. With args, additionally dumps
  * each named query's oracle SQL to /tmp/oracle_<name>.sql for ad-hoc
  * DuckDB runs. Round bookkeeping aid.
  */
object Inventory {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql
    println(s"COUNT queries=${q.size} oracles=${o.size}")
    println("ROWSONLY: " + (q -- o.keySet).toSeq.sorted.mkString(", "))
    println("ORPHAN: " + (o.keySet -- q).toSeq.sorted.mkString(", "))
    args.foreach { n =>
      val p = java.nio.file.Paths.get(s"/tmp/oracle_$n.sql")
      java.nio.file.Files.writeString(p, o.getOrElse(n, s"-- no oracle for $n"))
      println(s"WROTE $p")
    }
  }
}
