package graft.sim

import graft.SparkSpec
import graft.syntax._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Plan gate for the r7 shuffle-free Lloyd mean step: training must
  * never shuffle the corpus. The old groupByKey/mapGroups mean step
  * shuffled every vector to its cell's reducer each iteration (≥
  * iters × n records); the treeReduce formulation ships one k×dim sum
  * block per partition. Measured through a SparkListener over the
  * actual stage metrics, on a corpus large enough (replicated ×100)
  * that the two shapes differ by orders of magnitude.
  */
class LloydShuffleSpec extends SparkSpec {

  private class ShuffleRecords extends SparkListener {
    @volatile var recordsRead = 0L
    @volatile var stages      = 0
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      recordsRead += sc.stageInfo.taskMetrics.shuffleReadMetrics.recordsRead
      stages += 1
    }
  }

  test("Lloyd training shuffles centroid-sized state, never the corpus") {
    val base = graft.tables.Tables
      .embeddings(spark, sf0001)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val n0 = base.count()
    val e = base
      .crossJoin(spark.range(100).select($"id".as("rep")))
      .select(($"vec_id" + $"rep" * n0).as("vec_id"), $"v")
      .repartition(16)
      .localCheckpoint() // pin the corpus so its own build cost is outside the gate
    val n = e.count()

    val listener = new ShuffleRecords
    spark.sparkContext.addSparkListener(listener)
    try {
      Similarity.trainCentroids(spark, e, nCells = 16, iters = 3)
      // listener delivery is async: poll until the bus drains
      var last  = (-1L, -1)
      var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val cur = (listener.recordsRead, listener.stages)
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
    } finally spark.sparkContext.removeSparkListener(listener)

    info(s"corpus=$n rows; training shuffle records read=${listener.recordsRead} " +
      s"across ${listener.stages} stages")
    // old shape: >= iters * n = 15000+ records; new shape: the seed
    // TakeOrdered partials + one sum block per partition per iteration
    assert(listener.recordsRead < n / 2,
      s"training shuffled ${listener.recordsRead} records for a $n-row corpus — " +
        "the corpus is crossing the wire again")
  }
}
