package graft

/** [[Checkpoints.cut]] A/B: the reliable-checkpoint opt-in
  * (`spark.graft.iter.checkpointDir`, the executor-loss-tolerance knob
  * for iterative rounds — ChaosProbe mode `execkill` measures the fault
  * behavior under local-cluster) must change ONLY block placement, never
  * results. This spec runs representative queries from each swapped
  * family — pagerank rounds (Graph), textrank rounds (TextAnalysis), BPE
  * merge training (Bpe, the multi-job corpus pin) and IVF top-k (the
  * Lloyd training pin in Similarity) — with the conf set, against the
  * default localCheckpoint results, and requires exact row equality. It
  * also asserts the cut actually went through the reliable path
  * (checkpoint files exist under the configured dir).
  */
class ReliableCheckpointSpec extends SparkSpec {

  private val queries = Seq("g_pagerank", "text_textrank", "text_bpe_train", "ann_ivf_topk")

  test("reliable vs local cuts: identical results; files land in the dir") {
    def rows(q: String): Seq[String] =
      SparkEntry.queries(q)(spark, sf0001).collect().map(_.toString).toSeq

    val baseline = queries.map(q => q -> rows(q)).toMap
    val dir = java.nio.file.Files.createTempDirectory("graft-reliable-ckpt").toString
    spark.conf.set(Checkpoints.dirKey, dir)
    try {
      queries.foreach { q =>
        assert(rows(q) == baseline(q), s"$q diverged under reliable checkpointing")
      }
      // the cut really used the reliable path: checkpoint part files exist
      val walked = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      val parts =
        try walked.filter(p => p.getFileName.toString.startsWith("part-")).count()
        finally walked.close()
      assert(parts > 0, s"no checkpoint part files under $dir — cut fell back to localCheckpoint")
    } finally {
      spark.conf.unset(Checkpoints.dirKey)
      val all = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try
        all.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally all.close()
    }
  }
}
