package org.apache.spark

/** Test-only shim into Spark's `private[spark]` listener-bus API.
  *
  * ScaleWindowSpec attributes async QueryExecutionListener events to the
  * query being built via a mutable `building` var; fixed sleeps made
  * that attribution ±1 query under load (r11 ADVICE). Draining the
  * shared LiveListenerBus — which also carries the SQL execution events
  * that ExecutionListenerBus fans out to QueryExecutionListeners — before
  * advancing `building` makes the attribution deterministic. The members
  * are `private[spark]`, hence this one-liner living in Spark's package.
  */
object GraftBusDrain {
  /** Block until every queued listener event has been delivered (or the
    * timeout elapses — surfaced as a TimeoutException, not a silent miss).
    */
  def drain(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
