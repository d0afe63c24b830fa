package graft.dedup

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pins the recall-audit sample hash (r13: the stride-free doc_id
  * sampler mirrored between Spark and DuckDB). Two engines can only
  * agree if the arithmetic never leaves signed-64 range — DuckDB THROWS
  * on BIGINT overflow while Spark WRAPS silently, so the agreement
  * contract is: every intermediate stays < 2⁶³ for ids in
  * [0, (2⁶³−1)/K1 ≈ 3.47e9], which covers every corpus/stress id by
  * orders of magnitude (sf0.1 stress ids top out at doc_id·mult+rep ≈
  * 5e5). This spec (a) bit-pins the Column implementation against an
  * independent BigInt reference (no shared arithmetic), including at
  * the id bound, and (b) shows the sample is stride-free on exactly the
  * id shape that bit the `% mod` sampler: ids remapped as
  * doc_id·mult+rep with mod a multiple of mult.
  */
class SampleHashSpec extends SparkSpec {
  import spark.implicits._

  private val P  = 4294967291L
  private val K1 = 2654435761L
  private val K2 = 1103515245L

  /** Independent reference: BigInt end-to-end, so a silent Long overflow
    * in the Column path would diverge here.
    */
  private def ref(id: Long): Long = {
    val h1 = (BigInt(id) * K1) % P
    val h2 = h1 ^ (h1 >> 15)
    ((h2 * K2) % P).toLong
  }

  /** The engine-side Column path. (The DuckDB-dialect replay string
    * `sampleHashSql` can't run here — `xor()` is DuckDB's spelling —
    * but cross-ENGINE parity is already gate-proven: the sf0.1 oracle
    * sweep runs with mod = 10, so any Spark/DuckDB hash divergence
    * fails `dedup_lsh_recall` loudly. What the gate can't see is a
    * silent Long overflow making BOTH wrong the same way on big ids —
    * that's what the BigInt reference here owns.)
    */
  private def viaSpark(ids: Seq[Long]): Map[Long, Long] = {
    import org.apache.spark.sql.functions.col
    ids.toDF("doc_id").select(col("doc_id"), Dedup.sampleHash(col("doc_id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("sample hash: Spark SQL == independent BigInt reference over the id range") {
    val gen = Gen.frequency(
      6 -> Gen.choose(0L, 1000000L),            // corpus/stress regime
      2 -> Gen.choose(0L, 3400000000L),         // up to the safe bound
      1 -> Gen.oneOf(0L, 1L, 3470000000L))      // edges
    val ids = (0 until 500).flatMap(i => gen(Gen.Parameters.default, Seed(i.toLong))).distinct
    val got = viaSpark(ids)
    ids.foreach(id => assert(got(id) == ref(id), s"id=$id"))
  }

  test("sample hash: no intermediate leaves signed-64 range at the documented bound") {
    // (maxId * K1) is the largest intermediate; prove the headroom claim
    val maxId = 3470000000L
    assert(BigInt(maxId) * K1 < BigInt(Long.MaxValue))
    // and one step past the CLAIMED safe regime is still sub-2^63 only
    // because the bound has slack — the contract comment's number is
    // conservative, not razor-edge
    assert(BigInt(maxId + 1000000) * K1 < BigInt(Long.MaxValue))
  }

  test("sample is stride-free on replicated id shapes (the r12 ADVICE scenario)") {
    // ids = doc_id*mult+rep with mod a multiple of mult: the old
    // `doc_id % mod == 0` sampler selected ONLY rep=0 replicas; the
    // hash sampler must select across reps
    val mult = 100L
    val mod  = 500L // multiple of mult
    val ids  = for (base <- 0L until 500L; rep <- 0L until mult) yield base * mult + rep
    val selectedReps = ids.filter(id => ref(id) % mod == 0).map(_ % mult).distinct
    assert(selectedReps.size > 10,
      s"hash sample collapsed to ${selectedReps.size} replica classes — stride correlation")
  }
}
