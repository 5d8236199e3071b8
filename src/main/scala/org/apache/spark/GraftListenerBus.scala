package org.apache.spark

/** Listener-bus flush for [[graft.BenchMetrics]]: listener events
  * post asynchronously, so per-query metric attribution needs a bus
  * drain at each query boundary. `LiveListenerBus` is
  * `private[spark]`; this forwarder lives in the spark package for
  * access, nothing else.
  */
object GraftListenerBus {
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(5000L)
    catch { case _: Throwable => () }
}
