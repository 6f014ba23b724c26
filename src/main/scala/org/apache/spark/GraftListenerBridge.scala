package org.apache.spark

/** Bridge into `SparkContext.listenerBus` (private[spark]) so probe
  * code can deterministically drain listener events before reading
  * metric accumulators — without it a shuffle-bytes readout races the
  * async bus. Same-package shim pattern as sql.GraftColumnBridge.
  */
object GraftListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
