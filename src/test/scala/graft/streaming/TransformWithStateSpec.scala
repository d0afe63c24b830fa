package graft.streaming

import graft.SparkSpec
import graft.syntax._

/** `s_stream_state_tws` — the milestone machine on Spark 4's
  * `transformWithState` + RocksDB state store — must be row-identical to
  * the `flatMapGroupsWithState` leg (which itself is pinned to the batch
  * window replay by StreamStateSpec): two independent state backends and
  * two state APIs converging on one alert set. The run itself proves the
  * disk-backed provider engaged — Spark refuses to plan
  * transformWithState on the default in-heap provider.
  */
class TransformWithStateSpec extends SparkSpec {

  test("transformWithState on RocksDB equals the flatMapGroupsWithState fold") {
    val tws = StreamQueries.streamStateTws(spark, sf0001)
    val old = StreamQueries.streamState(spark, sf0001)
    val n   = tws.count()
    assert(n > 0, "no milestone crossings at sf0.001 — the test would be vacuous")
    assert(tws.collect().toSeq == old.collect().toSeq,
      "transformWithState diverged from the GroupState fold")
  }

  test("state store provider conf is restored after the run") {
    val key   = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    StreamQueries.streamStateTws(spark, sf0001).count()
    assert(spark.conf.getOption(key) == prior,
      "streamStateTws leaked the RocksDB provider conf into the session")
  }
}
