package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Phase timing for the hier-vs-flat IVF A/B: where does the wall go?
  * Generates the same jittered mult× corpus as StressHier, then times
  * scan, flat training, hier training, hier build-assignment and the
  * two full queries separately.
  */
object ProfileHier {
  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult  = sys.env.getOrElse("SPARK_GRAFT_STRESS_MULT", "100").toInt
    val spark = GraftSession.local(32, "graft-profile-hier")
    import spark.implicits._

    val work = java.nio.file.Files.createTempDirectory("graft-profile-hier").toString
    val emb  = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nEmb = emb.count()
    t("corpus gen") {
      emb
        .crossJoin(spark.range(mult).select($"id".as("rep")))
        .select(
          ($"vec_id" + $"rep" * nEmb).as("vec_id"),
          zip_with(
            col("embedding"),
            transform(sequence(lit(0), size(col("embedding")) - 1),
              i => ((($"rep" * 31 + i) % lit(7) - lit(3)) * lit(0.001f))),
            (x, j) => x + j).as("embedding"))
        .repartition(64)
        .write.mode("overwrite").parquet(s"$work/embeddings.parquet")
    }
    val nCells = 16 * mult
    val kc     = math.ceil(math.sqrt(nCells.toDouble)).toInt
    val kf     = math.ceil(nCells.toDouble / kc).toInt

    val e = graft.tables.Tables
      .embeddings(spark, work)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))

    t("scan+decode count")(e.count())
    val coarse = t(s"flat Lloyd kc=$kc x3")(graft.sim.Similarity.trainCentroids(spark, e, kc, 3))
    t(s"flat Lloyd nCells=$nCells x3")(graft.sim.Similarity.trainCentroids(spark, e, nCells, 3))
    val (c2, f2) = t(s"hier train kc=$kc kf=$kf")(
      graft.sim.HierIvf.trainCentroidsHier(spark, e, kc, kf, 3))
    t("hier build-assign full corpus") {
      val bcC = spark.sparkContext.broadcast(c2)
      val bcF = spark.sparkContext.broadcast(f2)
      val assignCell = udf { (v: Seq[Double]) =>
        graft.sim.HierIvf.assignHierArr(bcC.value, bcF.value, v.toArray)
      }
      e.withColumn("cell_id", assignCell($"v")).agg(max($"cell_id")).head()
    }
    t("full ivfHierTopK")(
      graft.sim.HierIvf.ivfHierTopK(spark, work, 5, kc, kf, 4, 2).count())
    t("full ivfTopK")(
      graft.sim.Similarity.ivfTopK(spark, work, 5, nCells, 4).count())

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    spark.stop()
  }
}
