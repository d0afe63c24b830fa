package graft.mm

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("blob metadata pass never decodes; byte_len matches text length") {
    val rows = Multimodal.mmMetadata(spark, sf0001).collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getInt(1) > 0))
  }

  test("mapPartitions decode is deterministic and schema-typed") {
    val a = Multimodal.mmDecode(spark, sf0001).collect()
    val b = Multimodal.mmDecode(spark, sf0001).collect()
    assert(a.toSeq == b.toSeq)
    a.foreach { r =>
      assert(r.getInt(2) >= 64 && r.getInt(2) < 576)  // width
      assert(Set("png", "jpeg").contains(r.getString(5)))
      // metadata is a pure function of bytes
      val (w, h, c, f) = Multimodal.FakeCodec.decode(Array.fill(r.getInt(1))(0))
      assert(r.getInt(2) == w && r.getInt(3) == h && r.getInt(4) == c && r.getString(5) == f)
    }
  }
}
