package org.apache.spark

/** Bridge to `private[spark]` listener-bus draining: observed metrics
  * are delivered asynchronously, so a pipeline run must flush the bus
  * before reading them.
  */
object GraftSparkShims {
  def waitForListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()

  /** Non-blocking read of an Observation's metrics (empty until the
    * observed action's listener fires) — `getOrEmpty` is
    * private[spark]; the public `get` blocks with no timeout.
    */
  def observedMetrics(obs: org.apache.spark.sql.Observation): Map[String, Any] =
    obs.getOrEmpty
}
