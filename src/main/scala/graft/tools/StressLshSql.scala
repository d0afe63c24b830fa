package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** One-off probe for the re-planned `sql_lsh_pairs` (bucket
  * collect-and-explode, single signature pass): the SQL face and the
  * library path ([[graft.dedup.Dedup.minhashPairs]]) timed side by side
  * on the suffix-decorrelated 10× corpus (the StressR9 build — per-token
  * df stays at base level while token types grow, so pair counts must
  * scale ~mult× and both paths' candidate stages stay bucket-bounded).
  * Output: one markdown bullet (stdout) for BENCH_LOCAL.
  */
object StressLshSql {

  private def t[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult  = sys.env.getOrElse("SPARK_GRAFT_STRESS_MULT", "10").toInt
    val spark = GraftSession.local(32, "graft-stress-lsh-sql")
    import spark.implicits._

    val work  = java.nio.file.Files.createTempDirectory("graft-stress-lshsql").toString
    val docs  = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    docs
      .crossJoin(spark.range(mult).select($"id".as("rep")))
      .select(
        ($"doc_id" + $"rep" * nDocs).as("doc_id"),
        array_join(transform(split($"text", " "), w => concat(w, lit("_"), $"rep")), " ")
          .as("text"),
        $"source", $"n_chars", $"lang")
      .repartition(64)
      .write.mode("overwrite").parquet(s"$work/documents.parquet")

    val (sqlPairs, tSql) = t { graft.dedup.Dedup.sqlLshPairs(spark, work).count() }
    val (libPairs, tLib) = t {
      graft.dedup.Dedup
        .minhashPairs(graft.tables.Tables.documents(spark, work), threshold = 0.5)
        .count()
    }
    println(
      f"- sql_lsh_pairs at ${nDocs * mult} docs (mult=$mult): $sqlPairs pairs in $tSql%.1f s " +
        f"(library minhashPairs: $libPairs pairs in $tLib%.1f s) — identical pair sets by " +
        "construction; the SQL face pays one extra corpus scan (the verify-stage text join " +
        "re-reads parquet) against the library path's cached-signature design")

    // the stateful streaming landing gate on the same corpus: per-bucket
    // min state through the real micro-batch engine (AvailableNow). The
    // stream source matches the testdata layout — a FILE named
    // documents.parquet — so stage a single-file copy of the corpus
    // (the multi-part stress dir matches nothing under the glob filter).
    val streamRoot = java.nio.file.Files.createTempDirectory("graft-stress-sdocs").toString
    val stage      = s"$streamRoot/_stage"
    spark.read.parquet(s"$work/documents.parquet")
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(
      part.toPath, java.nio.file.Paths.get(s"$streamRoot/documents.parquet"))
    val (flags, tStream) = t {
      graft.streaming.StreamQueries.queries("s_stream_near_dedup")(spark, streamRoot).count()
    }
    println(
      f"- s_stream_near_dedup at ${nDocs * mult} docs (mult=$mult): $flags flagged docs " +
        f"in $tStream%.1f s through the micro-batch engine (state = one long per occupied " +
        "band bucket)")
    spark.stop()
  }
}
