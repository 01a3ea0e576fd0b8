package org.apache.spark

/** Bridge to `private[spark]` listener-bus draining: observed metrics
  * are delivered asynchronously, so a pipeline run must flush the bus
  * before reading them.
  */
object GraftSparkShims {
  def waitForListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
