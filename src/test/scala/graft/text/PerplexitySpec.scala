package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the self-trained bigram-LM scorer: coverage (every
  * multi-token doc scored, n_bigrams = tokens − 1), range (self-trained
  * conditionals ⇒ every term ≤ 0), and determinism on duplicate text
  * (identical docs must get bit-identical scores).
  */
class PerplexitySpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  lazy val out  = TextAnalysis.textPerplexity(spark, sf0001).cache()
  lazy val docs = graft.tables.Tables.documents(spark, sf0001).cache()

  // the session is JVM-shared across suites: a suite-level cache left
  // behind trips every later cacheManager.isEmpty hygiene assertion
  // (latent until r11's chaos session ran the suites in a fresh order —
  // the full alphabetical run always scheduled dedup/forecast/sim
  // BEFORE text, so the leak was invisible)
  override def afterAll(): Unit = {
    out.unpersist()
    docs.unpersist()
    super.afterAll()
  }

  test("every multi-token document is scored with n_bigrams = tokens - 1") {
    val expected = docs
      .select($"doc_id", (size(split($"text", " ")) - 1).as("nb"))
      .filter($"nb" >= 1)
    val joined = expected.join(out, Seq("doc_id"), "full_outer")
    assert(joined.filter($"nb".isNull || $"n_bigrams".isNull).count() == 0)
    assert(joined.filter($"nb" =!= $"n_bigrams").count() == 0)
  }

  test("avg log-prob is non-positive and finite") {
    val r = out.agg(max($"avg_logprob"), min($"avg_logprob")).head()
    assert(r.getDouble(0) <= 0.0)
    assert(r.getDouble(1) > -30.0)
  }

  test("scores are bit-identical across independent runs (shuffle-order-free)") {
    val again = TextAnalysis.textPerplexity(spark, sf0001)
      .select($"doc_id", $"avg_logprob")
    val once = out.select($"doc_id", $"avg_logprob")
    assert(once.except(again).count() == 0)
    assert(again.except(once).count() == 0)
  }
}
