package graft.text

import graft.SparkSpec

/** Chunking/packing/redaction semantics on hand-built docs (the corpus
  * oracle covers scale; these pin the edge cases).
  */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunking: stride-32 windows of 40 tokens, short tail kept") {
    val dir = java.nio.file.Files.createTempDirectory("graft-chunk").toString
    Seq((1L, (1 to 100).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val chunks = Chunking.textChunk(spark, dir).collect()
    // starts at 0,32,64,96 → sizes 40,40,36,4; consecutive chunks share 8
    val sizes = chunks.map(r => r.getInt(1) -> r.getAs[Int]("n_tokens")).toMap
    assert(sizes == Map(0 -> 40, 1 -> 40, 2 -> 36, 3 -> 4))
  }

  test("packing: greedy per-bucket fill with oversize docs isolated") {
    // one bucket (all ids ≡ 0 mod 8): token counts 300, 300, 600, 100
    // greedy @512: [300] -> +300 overflows -> new [300] -> 600 overflows
    // -> new [600] (oversize alone) -> +100 overflows -> new [100]
    val docs = Seq(
      (0L, (1 to 300).map(_ => "t").mkString(" ")),
      (8L, (1 to 300).map(_ => "t").mkString(" ")),
      (16L, (1 to 600).map(_ => "t").mkString(" ")),
      (24L, (1 to 100).map(_ => "t").mkString(" "))
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-pack").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Chunking.textPack(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(0L -> 0L, 8L -> 1L, 16L -> 2L, 24L -> 3L))
  }

  test("decontamination flags train docs sharing an 8-gram with eval docs") {
    import java.security.MessageDigest
    def bucket(t: String): Char = MessageDigest
      .getInstance("MD5").digest(t.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.head
    // the md5 bucket rule decides splits, so salt the texts until they
    // land in the wanted split; the planted 8-token run is the leak
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    def find(seed: String, pred: Char => Boolean): String =
      Iterator.from(0)
        .map(i => s"$seed salt$i $shared trailer$i closing words")
        .find(t => pred(bucket(t))).get
    val evalDoc  = find("evalseed", c => c == 'e' || c == 'f')
    val trainDoc = find("trainseed", c => c != 'e' && c != 'f')
    val cleanDoc = Iterator.from(0)
      .map(i => s"clean$i one two three four five six seven eight nine ten eleven twelve")
      .find(t => { val c = bucket(t); c != 'e' && c != 'f' }).get
    val dir = java.nio.file.Files.createTempDirectory("graft-decontam").toString
    Seq((1L, trainDoc), (2L, evalDoc), (3L, cleanDoc))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Chunking.pipeDecontaminate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.exists { case (t, e, n) => t == 1L && e == 2L && n >= 1L })
    assert(!out.exists { case (t, e, _) => t == 3L || e == 3L })
  }

  test("redaction replaces emails and long digit runs, counts hits") {
    val dir = java.nio.file.Files.createTempDirectory("graft-redact").toString
    Seq((1L, "contact bob@example.com or call 4155550100 now"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Chunking.textRedact(spark, dir).collect()(0)
    assert(r.getAs[Int]("n_emails") == 1)
    assert(r.getAs[Int]("n_long_nums") == 1)
    assert(r.getAs[Int]("redacted_chars") == "contact <EMAIL> or call <NUM> now".length)
  }
}
