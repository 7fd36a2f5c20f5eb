package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Accessor for the private[spark] listener bus: measurement tooling
  * (graft.tools.PlanDump) must DRAIN the async bus before reading its
  * stage-attribution log — a fixed sleep races late-completing stages
  * out of the attribution (r16 ADVICE finding).
  */
object ListenerBusDrain {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
