package org.apache.spark

/** Listener-bus drain bridge. `SparkContext.listenerBus` and
  * `LiveListenerBus.waitUntilEmpty` are `private[spark]`, so harness
  * code that needs DETERMINISTIC task-metric reads (graft.Bench's
  * per-query diag, graft.tools.JobProfile) gets this minimal shim
  * inside the spark package — the same technique as the sql
  * graftbridge (no internals modified, only re-exported). A fixed
  * sleep was the previous drain and undercounted run/cpu/gc for
  * exactly the slow queries the diag targets: final-stage task-end
  * events ride the async bus and can arrive later than any fixed gap
  * under load.
  */
package object graftspark {
  /** Block until every queued listener event has been dispatched, or
    * `timeoutMs` elapses (swallowed: a diag read after a timed-out
    * drain is no worse than the fixed-sleep read it replaces).
    */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
