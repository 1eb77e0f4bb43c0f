package org.apache.spark

/** Package-local accessor for [[SparkContext.listenerBus]]'s drain
  * barrier (`private[spark]` upstream). Needed by
  * `graft.tools.ShuffleAudit.measureTotal`: stage-completed events are
  * delivered asynchronously, so a listener-based metrics sum read
  * immediately after `collect()` would race the bus and undercount the
  * final stages. This is the standard Spark test-utils pattern — the
  * only member accessed is public-OSS Spark, no behavior is changed. */
object GraftListenerFlush {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
