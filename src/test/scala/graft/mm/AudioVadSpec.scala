package graft.mm

import graft.SparkSpec

/** The VAD must recover exactly the planted speech/silence structure:
  * every emitted segment's activity equals the synth's block rule over
  * its whole frame range, and adjacent segments alternate.
  */
class AudioVadSpec extends SparkSpec {

  test("detected segments recover the planted duty cycle exactly") {
    val rows = Audio.mmAudioVad(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id    = r.getLong(0)
      val act   = r.getInt(2) == 1
      val start = r.getInt(3)
      val nF    = r.getLong(4).toInt
      (start until start + nF).foreach { f =>
        assert(Audio.vadActiveBlock(id, f) == act,
          s"doc $id frame $f: detected $act but planted ${Audio.vadActiveBlock(id, f)}")
      }
    }
    rows.groupBy(_.getLong(0)).foreach { case (idd, segs) =>
      val acts = segs.sortBy(_.getInt(1)).map(_.getInt(2)).toSeq
      assert(acts.sliding(2).forall(w => w.length < 2 || w(0) != w(1)),
        s"doc $idd: adjacent segments share activity $acts")
    }
  }
}
