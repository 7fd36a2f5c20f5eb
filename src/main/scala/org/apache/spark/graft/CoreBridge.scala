package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Core-side shim: `SparkContext.listenerBus` is `private[spark]`, but
  * draining it is the only way to read listener-captured write metrics
  * synchronously after an action returns (the bus is async — a
  * `df.write` call can return before its final TaskEnd events are
  * delivered). `LiveListenerBus.waitUntilEmpty()` itself is public.
  */
object CoreBridge {
  def flushListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
