package graft.tools

/** Prints the driver-facing query inventory: total queries, oracle
  * coverage, and the rows-only remainder. With args, additionally dumps
  * each named query's oracle SQL into a fresh per-run temp directory for
  * ad-hoc DuckDB runs. Round bookkeeping aid.
  */
object Inventory {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql
    println(s"COUNT queries=${q.size} oracles=${o.size}")
    println("ROWSONLY: " + (q -- o.keySet).toSeq.sorted.mkString(", "))
    println("ORPHAN: " + (o.keySet -- q).toSeq.sorted.mkString(", "))
    if (args.nonEmpty) {
      // a fresh 0700 directory per run: no fixed world-shared path to
      // symlink-hijack, no clobbering a previous run's dumps
      val dir = java.nio.file.Files.createTempDirectory("graft-oracle-")
      args.foreach { n =>
        val p = dir.resolve(s"oracle_$n.sql")
        java.nio.file.Files.writeString(p, o.getOrElse(n, s"-- no oracle for $n"))
        println(s"WROTE $p")
      }
    }
  }
}
