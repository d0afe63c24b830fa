package graft.sim

import graft.SparkSpec
import graft.syntax._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contract of the two-level IVF: well-formed output, recall vs brute
  * force pinned (approximation confined to candidate generation, as
  * with every other ANN path), hierarchical assignment consistent with
  * its own structure, short cells padded deterministically, and the
  * bounded training-sample cap engaging without breaking the query.
  */
class HierIvfSpec extends SparkSpec {

  private def embeddings = graft.tables.Tables
    .embeddings(spark, sf0001)
    .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))

  private lazy val result =
    HierIvf.ivfHierTopK(spark, sf0001, k = 5, kc = 4, kf = 4, nprobe = 4, wCoarse = 2).collect()

  test("result is well-formed: no self matches, contiguous ranks, at most k rows per probe") {
    assert(result.nonEmpty)
    assert(!result.exists(r => r.getLong(0) == r.getLong(1)), "probe returned itself")
    result.groupBy(_.getLong(0)).foreach { case (p, rows) =>
      val ranks = rows.map(_.getInt(3)).sorted.toSeq
      assert(ranks == (1 to ranks.length), s"probe $p ranks not contiguous: $ranks")
      assert(ranks.length <= 5, s"probe $p emitted ${ranks.length} > k rows")
    }
  }

  test("recall vs brute force stays above the pinned floor") {
    val exact = Similarity
      .bruteForceTopK(spark, sf0001, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val got = result.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    info(f"hier-IVF recall@5 = $recall%.3f (${got.size} vs ${exact.size} exact)")
    assert(recall >= 0.50, f"recall collapsed: $recall%.3f")
  }

  test("assignment is hierarchically consistent: fine argmax within the coarse argmax") {
    val e              = embeddings
    val (coarse, fine) = HierIvf.trainCentroidsHier(spark, e, kc = 4, kf = 4, iters = 3)
    assert(fine.length == 4 && fine.forall(_.length == 4), "fine grid not kc x kf")
    val vs = e.collect().map(r => r.getSeq[Double](1).toArray)
    vs.foreach { v =>
      val id = HierIvf.assignHierArr(coarse, fine, v)
      assert(id >= 0 && id < 16, s"cell id $id out of range")
      val c = id / 4
      assert(c == Similarity.nearestCellArr(coarse, v), "coarse level of id is not the coarse argmax")
      assert(id % 4 == Similarity.nearestCellArr(fine(c), v), "fine level of id is not the in-cell argmax")
    }
  }

  test("probe cells come only from the wCoarse best coarse cells, best-first") {
    val e              = embeddings
    val (coarse, fine) = HierIvf.trainCentroidsHier(spark, e, kc = 4, kf = 4, iters = 3)
    val v              = e.orderBy($"vec_id").limit(1).collect()(0).getSeq[Double](1).toArray
    val cells          = HierIvf.probeCellsHierArr(coarse, fine, v, wCoarse = 2, nprobe = 4)
    assert(cells.length == 4)
    assert(cells.distinct.length == cells.length, "duplicate probe cell")
    val allowedCoarse = Similarity.probeCellsArr(coarse, v, 2).toSet
    assert(cells.forall(id => allowedCoarse.contains(id / 4)), "probe cell outside wCoarse cells")
    val sims = cells.map(id => Similarity.cosLocal(fine(id / 4)(id % 4), v))
    assert(
      sims.zip(sims.tail).forall { case (a, b) => a >= b },
      s"probe cells not best-first: $sims"
    )
  }

  test("a coarse cell with fewer sample vectors than kf pads with its coarse centroid") {
    import spark.implicits._
    // 5 near-identical vectors land in one coarse cell; the opposite
    // direction gets a single vector, so its fine list must pad
    val rows = Seq(
      (0L, Array(1.0, 0.0)), (1L, Array(0.99, 0.01)), (2L, Array(0.98, 0.02)),
      (3L, Array(0.97, 0.03)), (4L, Array(0.96, 0.04)),
      (5L, Array(-1.0, 0.0))
    ).toDF("vec_id", "v")
    val (coarse, fine) = HierIvf.trainCentroidsHier(spark, rows, kc = 2, kf = 4, iters = 2)
    assert(fine.forall(_.length == 4), "fine slots not dense")
    val padded = fine.zipWithIndex.flatMap { case (cells, c) =>
      cells.zipWithIndex.collect { case (fc, j) if fc.sameElements(coarse(c)) => (c, j) }
    }
    assert(padded.nonEmpty, "expected at least one coarse-padded fine slot")
    // padding fills from the tail: every slot after a padded one is padded too
    padded.groupBy(_._1).foreach { case (c, js) =>
      val first = js.map(_._2).min
      assert((first until 4).forall(j => fine(c)(j).sameElements(coarse(c))),
        s"cell $c pads non-contiguously")
    }
    // equal-similarity duplicates (what padding creates) resolve to the
    // FIRST index — the strict-> discipline shared with the flat path
    val dup = fine(padded.head._1)(padded.head._2)
    assert(Similarity.nearestCellArr(Array(dup, dup.clone()), dup) == 0,
      "tie between identical centroids did not resolve to the first index")
  }

  test("hier-built index: partitioned layout, pruned read, full width equals brute force") {
    val dir            = java.nio.file.Files.createTempDirectory("graft-hier-index").toString
    val e              = embeddings
    val (_, fine)      = HierIvf.writeIvfIndexHierFor(spark, e, dir, kc = 4, kf = 4, iters = 3)
    val cellDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("cell_id="))
    assert(cellDirs.nonEmpty && cellDirs.length <= 16, "hier index not cell-partitioned")
    val probes = e.filter($"vec_id" < 10).select($"vec_id".as("probe_id"), $"v".as("pv"))
    // a narrow probe must plan PartitionFilters on cell_id — the pruned
    // read is the point of the materialized layout, hier or flat
    val narrow = Similarity.ivfProbeIndexBatch(
      spark, dir, fine.flatten, probes.filter($"probe_id" === 0L), k = 5, nprobe = 2)
    val plan = narrow.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell_id"), plan)
    assert(narrow.count() == 5)
    // full width covers every cell ⇒ EXACTLY brute force, ranks included
    val full = Similarity.ivfProbeIndexBatch(spark, dir, fine.flatten, probes, k = 5, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val bf = Similarity.bruteForceTopK(spark, sf0001, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(full.toSeq == bf.toSeq, "hier-built full-width index read != brute force")
  }

  test("the sample cap engages without breaking the query shape") {
    val e = embeddings
    val (coarse, fine) =
      HierIvf.trainCentroidsHier(spark, e, kc = 4, kf = 4, iters = 3, sampleCap = 8)
    assert(coarse.length == 4 && fine.forall(_.length == 4))
    // with only 8 sample rows per cell the trainer must still emit a
    // total assignment over the full corpus
    val vs = e.collect().map(r => r.getSeq[Double](1).toArray)
    val ids = vs.map(HierIvf.assignHierArr(coarse, fine, _)).toSet
    assert(ids.forall(id => id >= 0 && id < 16))
  }

  test("corpus smaller than kc trains without throwing and pads to coarse.length") {
    // trainCentroids returns min(n, kc) centroids; the hier padding loop
    // must follow that length, not kc (r7 ADVICE: it indexed coarse(c)
    // up to kc-1 and threw where the flat trainer degrades gracefully)
    val tiny = embeddings.filter($"vec_id" < 5)
    val (coarse, fine) = HierIvf.trainCentroidsHier(spark, tiny, kc = 8, kf = 2, iters = 2)
    assert(coarse.length == 5, s"expected 5 coarse centroids, got ${coarse.length}")
    assert(fine.length == 5 && fine.forall(_.length == 2))
    val vs = tiny.collect().map(r => r.getSeq[Double](1).toArray)
    vs.foreach { v =>
      val id = HierIvf.assignHierArr(coarse, fine, v)
      assert(id >= 0 && id < 10)
    }
  }

  test("adaptive cutover: plain writeIvfIndexFor above the threshold delegates to hier") {
    // nCells = 2000 > hierCutoverCells: the flat API must transparently
    // build the two-level index — visible as a kc·kf = 45·45 flat
    // centroid list — and full-width probing of it must still be EXACTLY
    // brute force (every vector in exactly one cell, any centroid set)
    val dir   = java.nio.file.Files.createTempDirectory("graft-cutover").toString
    val cents = Similarity.writeIvfIndexFor(spark, embeddings, dir, nCells = 2000, iters = 2)
    assert(cents.length == 45 * 45, s"cutover did not engage: ${cents.length} centroids")
    val probes = embeddings.filter($"vec_id" < 10).select($"vec_id".as("probe_id"), $"v".as("pv"))
    val full = Similarity
      .ivfProbeIndexBatch(spark, dir, cents, probes, k = 5, nprobe = cents.length)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val bf = Similarity.bruteForceTopK(spark, sf0001, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(full.toSeq == bf.toSeq, "cutover index full-width read != brute force")
  }
}
