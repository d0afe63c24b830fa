package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Diagnostic companion to [[ProfilePpjoin]]: counts the PPJoin
  * intermediates (postings, prefix postings, raw join output, distinct
  * candidates, verified pairs) on the decorrelated corpus so the
  * superlinear term has a NUMBER attached to each pipeline edge.
  * Mirrors the dedupPpjoinPairs prefix pipeline (t = 1/2).
  */
object ProbePpjoinCand {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mults = sys.env.getOrElse("SPARK_GRAFT_STRESS_MULTS", "10,100")
      .split(",").map(_.trim.toInt).toSeq
    val spark = GraftSession.local(32, "graft-probe-ppjoin-cand")
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)

    val work  = java.nio.file.Files.createTempDirectory("graft-probe-cand").toString
    val base  = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = base.count()

    for (mult <- mults) {
      base
        .crossJoin(spark.range(mult).select($"id".as("rep")))
        .select(
          ($"doc_id" + $"rep" * nDocs).as("doc_id"),
          array_join(transform(split($"text", " "), w => concat(w, lit("_"), $"rep")), " ")
            .as("text"))
        .repartition(64)
        .write.mode("overwrite").parquet(s"$work/documents.parquet")

      val docs = spark.read.parquet(s"$work/documents.parquet")
        .select($"doc_id", graft.functions.GraftFunctions.shingles3($"text").as("sh"))
        .filter(size($"sh") > 0)
        .persist()
      val post = docs
        .select($"doc_id", size($"sh").as("n"), explode($"sh").as("tok"))
        .select($"doc_id", $"n", xxhash64($"tok").as("tok"))
      val byTok = org.apache.spark.sql.expressions.Window.partitionBy($"tok")
      val byDoc = org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")
      val tn = graft.dedup.Dedup.ppjoinTNum
      val td = graft.dedup.Dedup.ppjoinTDen
      val prefixLen = expr(s"n - (n * $tn + ${td - 1}) div $td + 1")
      val ranked = post
        .withColumn("df", count(lit(1)).over(byTok))
        .withColumn("rn", row_number().over(byDoc.orderBy($"df".asc, $"tok".asc)))
        .select($"doc_id", $"tok", $"n", $"rn")
        .persist()
      val pref = ranked.filter($"rn" <= prefixLen)
      val suff = ranked.filter($"rn" > prefixLen)
      val lengthOk = $"a.n" * tn <= $"b.n" * td && $"b.n" * tn <= $"a.n" * td
      val posUb = least($"a.rn", $"b.rn") +
        least($"a.n" - $"a.rn", $"b.n" - $"b.rn")
      def leg(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame, cls: Int) =
        l.as("a").join(r.as("b"),
            $"a.tok" === $"b.tok" && $"a.doc_id" < $"b.doc_id" && lengthOk)
          .select(
            $"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
            $"a.n".as("na"), $"b.n".as("nb"),
            lit(cls).as("cls"), posUb.as("ub"))
      val legs = leg(pref, pref, 0)
        .unionByName(leg(pref, suff, 1))
        .unionByName(leg(suff, pref, 2))
      val grouped = legs
        .groupBy($"doc_a", $"doc_b", $"na", $"nb")
        .agg(
          sum(when($"cls" === 0, 1).otherwise(0)).as("mpp"),
          sum(when($"cls" === 1, 1).otherwise(0)).as("mps"),
          sum(when($"cls" === 2, 1).otherwise(0)).as("msp"),
          min($"ub").as("pos_ub"))
        .filter($"mpp" >= 1)
        .persist()
      val nPost    = post.count()
      val nPrefix  = pref.count()
      val nLegRows = legs.count()
      val nPpPairs = grouped.count()
      val nCand = grouped
        .withColumn("sa", expr(s"(na * $tn + ${td - 1}) div $td - 1"))
        .withColumn("sb", expr(s"(nb * $tn + ${td - 1}) div $td - 1"))
        .withColumn("iub", least($"pos_ub",
          $"mpp" + $"mps" + $"msp" + least($"sa" - $"msp", $"sb" - $"mps")))
        .filter($"iub" * (td + tn) >= ($"na" + $"nb") * tn)
        .count()
      println(s"== mult=$mult: postings=$nPost prefixPostings=$nPrefix " +
        s"legRows=$nLegRows prefixSharingPairs=$nPpPairs boundedCand=$nCand")
      grouped.unpersist(); ranked.unpersist()
      docs.unpersist()
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    spark.stop()
  }
}
