package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Test-only bridge: `SparkContext.listenerBus` is `private[spark]`,
  * but deterministic listener-based assertions (job counts, task
  * metrics) need to DRAIN the async bus rather than sleep a fixed
  * interval — a loaded machine can outlast any sleep and undercount
  * events in either direction. Lives under the `org.apache.spark`
  * package namespace solely for access; nothing is modified.
  */
object ListenerBridge {
  def drain(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
