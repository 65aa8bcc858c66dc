package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `private[spark]` access shim (same pattern as
  * org.apache.spark.sql.graft.VectorBridge): draining the listener bus is
  * the only reliable way to observe final task metrics right after a write
  * job, and `SparkContext.listenerBus` is spark-private.
  */
object ListenerBridge {
  def drain(sc: SparkContext, timeoutMillis: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
