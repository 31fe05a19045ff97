package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Access to the listener bus's drain barrier (private[spark]): lets a
  * benchmark attribute asynchronous stage-metrics events to the query
  * that produced them before reading its counters.
  */
object ListenerSync {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
