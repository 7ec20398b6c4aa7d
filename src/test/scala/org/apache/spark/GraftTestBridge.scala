package org.apache.spark

/** Test-only escape hatch into `private[spark]` scheduler internals:
  * deterministic listener-bus draining for the job-count specs.
  * `SparkContext.listenerBus` is package-private, so the accessor has
  * to live in this package; nothing here ships in the library jar
  * (test sources only).
  */
object GraftTestBridge {
  /** Block until every queued listener event has been delivered (or
    * `timeoutMs` elapses) — the deterministic replacement for the
    * fixed `Thread.sleep` drains that made job-count assertions flaky
    * on a loaded box (round-12 advice).
    */
  def waitListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
