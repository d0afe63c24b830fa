package graft.streaming

import graft.SparkSpec

/** The streaming dedup must absorb the injected redelivery slice and
  * converge to exactly the distinct original rows.
  */
class StreamDedupSpec extends SparkSpec {

  test("dropDuplicatesWithinWatermark absorbs the 10% redelivery injection") {
    val events = graft.tables.Tables.events(spark, sf0001)
    val n      = events.count()
    val nDup   = events.filter(org.apache.spark.sql.functions.col("event_id") % 10 === 0).count()
    assert(nDup > 0, "injection slice empty — the test would be vacuous")
    val out = StreamQueries.streamDedup(spark, sf0001).collect()
    assert(out.length == n, s"expected $n distinct rows, got ${out.length}")
    val ids = out.map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "duplicate event_id survived the dedup")
  }
}
