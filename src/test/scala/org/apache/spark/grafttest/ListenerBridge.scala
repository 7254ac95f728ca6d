package org.apache.spark.grafttest

import org.apache.spark.SparkContext

/** Test-only bridge to the `private[spark]` listener bus: lets specs
  * block until async task-end events drain instead of sleeping a fixed
  * interval (which flakes on loaded hosts). */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
