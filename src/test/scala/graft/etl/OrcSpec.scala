package graft.etl

import graft.SparkSpec
import graft.syntax._
import graft.tables.Tables

/** ORC sink/source roundtrip + planner integration: values and schema
  * survive byte-exactly, and filters/projections reach the ORC reader
  * exactly as they do the parquet one.
  */
class OrcSpec extends SparkSpec {

  test("orc roundtrip is value- and schema-exact; scan gets pushdown + pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    try {
      val src = Tables.lineitem(spark, sf0001)
        .select($"l_orderkey", $"l_partkey", $"l_quantity", $"l_extendedprice", $"l_returnflag")
      Warehouse.writeOrc(src, s"$dir/lineitem_orc")
      val back = Warehouse.readOrc(spark, s"$dir/lineitem_orc")
      assert(back.schema == src.schema)
      val key = (df: org.apache.spark.sql.DataFrame) =>
        df.orderBy("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
          .collect().map(_.toSeq).toSeq
      assert(key(back) == key(src))

      val q = back.filter($"l_returnflag" === "R").select($"l_orderkey", $"l_quantity")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]"),
        s"ORC scan lost the pushdown:\n$plan")
      // projection pruning: only the needed columns (+filter col) are read
      assert(!plan.contains("l_extendedprice"), s"ORC scan reads pruned columns:\n$plan")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
