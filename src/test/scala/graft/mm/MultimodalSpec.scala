package graft.mm

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("blob metadata pass never decodes; byte_len matches text length") {
    val rows = Multimodal.mmMetadata(spark, sf0001).collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getInt(1) > 0))
  }

  test("frame dedup finds the planted shared frame and caps the hot frame") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fdedup").toString
    // 101 docs share one hot leading frame (over the 100-doc cap → must
    // be excluded); docs 200/201 share a distinct frame → the ONE pair
    val hot    = "H" * 64
    val shared = "S" * 64
    val docs =
      (0 until 101).map(i => (i.toLong, hot + s"tail$i" * 10)) ++
        Seq((200L, shared + "x" * 50), (201L, shared + "y" * 50))
    docs.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Multimodal.mmFrameDedup(spark, dir).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((200L, 201L, 1L)))
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
