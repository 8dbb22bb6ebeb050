package org.apache.spark

/** Narrow shim into `private[spark]` surface. The only consumer is
  * [[graft.Stress]]'s spill gate: `SparkContext.listenerBus` is
  * private[spark], and draining it is the ONLY way to make per-query
  * spill attribution exact — SparkListener events are delivered on an
  * async queue, so a stage-completed event (carrying the spill bytes)
  * can land AFTER the gate samples its counter, silently crediting one
  * query's spill to the next (or to nobody, for the last query of a
  * pass). Production graft code never touches this package. */
object GraftSparkShims {
  /** Block until every queued listener event has been delivered (bounded
    * by the bus's own timeout; surfaces TimeoutException rather than
    * letting a wedged bus make the gate silently lossy). */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
