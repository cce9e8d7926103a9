package org.apache.spark

/** Bench-side access to `SparkContext.listenerBus` (private[spark]):
  * draining the async listener bus between timed passes is the only way
  * to attribute task metrics to the query that produced them.
  */
object GraftSparkShim {
  def waitListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
