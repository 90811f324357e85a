package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge into the `private[spark]` listener bus so the bench can
  * DRAIN pending listener events before snapshotting per-gate task
  * metrics. The listener bus is asynchronous: task-end events for a
  * just-finished job may still be queued, and without a drain a
  * gate's CPU time bleeds into the next gate's snapshot. This is the
  * same technique Spark's own test suites use
  * (`sc.listenerBus.waitUntilEmpty()` throughout spark/core tests);
  * it needs a compilation unit inside an `org.apache.spark`
  * subpackage, hence this one-object file. */
object ListenerBusDrain {
  /** Block until every queued listener event is dispatched (bounded
    * wait; a pathological 30 s backlog aborts rather than hangs the
    * bench). */
  def drain(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000L)
}
