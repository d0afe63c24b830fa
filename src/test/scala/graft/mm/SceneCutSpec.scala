package graft.mm

import graft.SparkSpec

/** The planted separation is the contract: consecutive frames inside a
  * scene sit at circular distance exactly 1/pixel (sum = 64), cuts fire
  * exactly at scene starts (f % sceneLen == 0), and the margin between
  * the two populations is wide on both sides of the threshold.
  */
class SceneCutSpec extends SparkSpec {

  test("cuts fire exactly at planted scene boundaries with a wide margin") {
    val rows = Multimodal.mmSceneCut(spark, sf0001).collect()
    assert(rows.nonEmpty)
    var cuts = 0
    rows.foreach { r =>
      val id   = r.getLong(0)
      val f    = r.getInt(1)
      val diff = r.getLong(2)
      val cut  = r.getInt(3) == 1
      val atBoundary = f % Multimodal.scSceneLen(id) == 0
      assert(cut == atBoundary, s"doc $id frame $f: cut=$cut but boundary=$atBoundary")
      if (cut) { cuts += 1; assert(diff > 1500,
        s"boundary diff $diff too close to threshold") }
      else assert(diff == Multimodal.frameDimPx.toLong * Multimodal.frameDimPx,
        s"within-scene diff $diff != 64 (jitter contract broken)")
    }
    assert(cuts > 0, "no cuts planted — vacuous")
  }
}
