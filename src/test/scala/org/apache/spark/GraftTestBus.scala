package org.apache.spark

/** Test-only accessor for the private[spark] listener bus: listener-based
  * job-count specs must FLUSH the bus before reading their counters
  * instead of sleeping an arbitrary interval. */
object GraftTestBus {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
