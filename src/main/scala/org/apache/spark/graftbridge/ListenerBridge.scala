package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` listener plumbing (same pattern as
  * `sql.graftbridge.ColumnBridge`): task-metric listeners are ASYNC — a
  * benchmark reading an accumulator right after a job returns races the
  * bus, so per-query CPU attribution needs a drain barrier.
  */
object ListenerBridge {

  /** Block until every queued listener event has been delivered. */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
