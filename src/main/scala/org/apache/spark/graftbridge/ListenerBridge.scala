package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Deterministic listener-bus drain for the measurement mains.
  *
  * `SparkContext.listenerBus` and `LiveListenerBus.waitUntilEmpty` are
  * `private[spark]`, so the one call that makes per-query resource
  * attribution deterministic (instead of a bounded sleep-poll that can
  * credit a straggler task's shuffle bytes to the NEXT query's record)
  * lives in this one-file shim inside the `org.apache.spark` namespace.
  * Everything else in this project lives under `graft.*`.
  */
object ListenerBridge {
  /** Blocks until every queued listener event has been dispatched, or
    * `timeoutMillis` elapses. Returns true iff the bus fully drained. */
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMillis: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMillis); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
