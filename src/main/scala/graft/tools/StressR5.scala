package graft.tools

import graft.GraftSession
import graft.dedup.Hashing
import graft.sim.Similarity
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Round-5 stress probe for the two new quadratic-risk paths, following
  * the [[Stress]] recipe (row-multiplied corpus, de-correlated replicas,
  * planted verbatim dups every 50th replica):
  *
  *  - '''SemDeDup''': the within-cell pair stage is O(n²/k), so k (cells)
  *    must SCALE WITH THE CORPUS to hold cluster size — here
  *    nCells = nVecs / 200, the paper's ~constant-cluster-size regime.
  *    Logged: cell-size histogram (balance ⇒ the quadratic stays
  *    bounded), pair count, end-to-end wall time.
  *  - '''dup-span shared grams''': the groupBy(gram) distinct-doc count
  *    has no pair join to blow up, but a heavy-tailed gram frequency
  *    would skew its shuffle. Logged: gram doc-frequency histogram +
  *    end-to-end wall time — verbatim doc replicas (cadence scaled to
  *    mult so every base doc gets ≥ 2 copies) guarantee real shared
  *    grams exist to find.
  *
  * Output: one markdown section (stdout) appended to BENCH_LOCAL.md.
  */
object StressR5 {

  private def t[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult  = sys.env.getOrElse("SPARK_GRAFT_STRESS_MULT", "10").toInt
    val spark = GraftSession.local(32, "graft-stress-r5")
    import spark.implicits._

    def log(s: String): Unit = println(s)
    log(s"### r5 stress run (mult=$mult, base=$sfDir)")
    log("")

    // ---- corpus build (Stress's perturbation recipe, with the verbatim
    // cadence scaled to mult: Stress's fixed `rep % 50` plants dup PAIRS
    // only at mult >= 51 — at the default mult=10 it would leave a single
    // verbatim copy per base and the positive control would be dead) ----
    val verbatimEvery = math.max(1, mult / 2)
    val perturb = udf { (text: String, docId: Long, rep: Int) =>
      if (rep % verbatimEvery == 0) text
      else {
        val words = text.split(' ')
        val sb = new StringBuilder(text.length * 2)
        var i = 0
        while (i < words.length) {
          sb.append(words(i)).append(' ')
          if (i % 2 == 1) {
            sb.append('h')
            sb.append(java.lang.Long.toHexString(Hashing.hash64(s"$docId:$rep:$i")))
            sb.append(' ')
          }
          i += 1
        }
        sb.result().trim
      }
    }
    val docPath = s"/tmp/graft_stress_r5_docs_$mult"
    graft.tables.Tables
      .documents(spark, sfDir)
      .select($"doc_id", $"text")
      .withColumn("rep", explode(sequence(lit(0), lit(mult - 1))))
      .select((($"doc_id" * mult) + $"rep").as("doc_id"), perturb($"text", $"doc_id", $"rep").as("text"))
      .write.mode("overwrite").parquet(s"$docPath/documents.parquet")
    val nDocs = spark.read.parquet(s"$docPath/documents.parquet").count()
    log(f"- docs corpus: $nDocs%,d")

    // ---- dup-span shared grams -----------------------------------------
    val (gramHist, tGram) = t {
      val docs  = spark.read.parquet(s"$docPath/documents.parquet")
        .withColumn("ws", split($"text", " ")).withColumn("m", size($"ws"))
      val grams = docs.select(
        $"doc_id",
        explode(filter(
          transform(sequence(lit(1), $"m"),
            i => struct(i.as("start"), array_join(slice($"ws", i, lit(8)), " ").as("g"))),
          x => x("start") <= $"m" - 7)).as("x"))
        .select($"doc_id", $"x.g".as("g"))
      grams
        .groupBy($"g").agg(countDistinct($"doc_id").as("nd"))
        .agg(
          count(lit(1)).as("grams"),
          max($"nd").as("max_nd"),
          sum(when($"nd" >= 2, 1L).otherwise(0L)).as("shared"),
          expr("approx_percentile(nd, array(0.5, 0.99))").as("pct")
        )
        .collect()(0)
    }
    log(f"- dup-span grams: total=${gramHist.getLong(0)}%,d shared=${gramHist.getLong(2)}%,d " +
      f"maxDocFreq=${gramHist.getLong(1)}%,d p50/p99=${gramHist.getSeq[Long](3).mkString("/")} " +
      f"($tGram%.1f s)")
    val (nDupDocs, tDup) = t(
      TextAnalysis.textDupSpans(spark, docPath).filter($"n_shared_starts" > 0).count())
    log(f"- dup-span end-to-end: $nDupDocs%,d docs with shared spans in $tDup%.1f s" +
      f" (verbatim cadence: every $verbatimEvery%d reps)")

    // ---- SemDeDup with corpus-proportional cells -----------------------
    val jitter = udf { (v: Seq[Double], vecId: Long, rep: Int) =>
      val outV = new Array[Double](v.length)
      var i = 0
      while (i < v.length) {
        outV(i) = v(i) + (Hashing.hash64(s"$vecId:$rep:$i") % 1000L) / 1e6
        i += 1
      }
      outV
    }
    val emb0 = graft.tables.Tables.embeddings(spark, sfDir)
      .select($"vec_id", transform($"embedding", x => x.cast("float")).as("embedding"))
    val nBase = emb0.count()
    val embPath = s"/tmp/graft_stress_r5_emb_$mult"
    emb0
      .withColumn("rep", explode(sequence(lit(0), lit(mult - 1))))
      .select(
        (($"rep" * nBase) + $"vec_id").as("vec_id"),
        transform(jitter(transform($"embedding", x => x.cast("double")), $"vec_id", $"rep"),
          x => x.cast("float")).as("embedding"),
        lit(0).as("label")
      )
      .write.mode("overwrite").parquet(s"$embPath/embeddings.parquet")
    val nVecs  = spark.read.parquet(s"$embPath/embeddings.parquet").count()
    val nCells = math.max(16, (nVecs / 200).toInt) // constant cluster size
    log(f"- embeddings corpus: $nVecs%,d vectors, nCells=$nCells (≈200/cell)")
    val (semOut, tSem) = t {
      val out = Similarity.semDeDupKeep(spark, embPath, nCells = nCells, tau = 0.99)
      (out.count(), out.filter($"keep" === 0).count())
    }
    log(f"- semdedup end-to-end: ${semOut._1}%,d vectors, ${semOut._2}%,d dropped " +
      f"as near-dups in $tSem%.1f s (tau=0.99; every replica is a jittered near-dup " +
      "of its base, so ~(mult-1)/mult of the corpus should drop)")
    spark.stop()
  }
}
