package org.apache.spark

/** Main-source escape hatch into `private[spark]` scheduler internals
  * for the offline tools (JobAudit): deterministic listener-bus
  * draining. The test-source twin is GraftTestBridge.
  */
object GraftMainBridge {
  def waitListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
