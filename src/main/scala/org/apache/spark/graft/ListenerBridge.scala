package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `listenerBus.waitUntilEmpty` is `private[spark]`; benchmarking needs
  * it to attribute stage metrics to the query that just ran (listener
  * delivery is asynchronous). Same-namespace re-export, nothing
  * re-implemented.
  */
object ListenerBridge {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
