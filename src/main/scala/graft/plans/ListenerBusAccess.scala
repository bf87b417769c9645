package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is private[spark]; this shim (same
  * package-injection pattern as org.apache.spark.sql.graft's
  * expressions) exposes only the drain the bench needs for correct
  * per-query metric attribution. */
object ListenerBusAccess {
  def waitUntilEmpty(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
