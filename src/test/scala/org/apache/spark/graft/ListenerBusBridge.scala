package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge into the `private[spark]` listener-bus flush so specs
  * can deterministically assert on listener-observed action counts (the
  * QueryExecutionListener dispatch is async). No logic, access only. */
object ListenerBusBridge {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
