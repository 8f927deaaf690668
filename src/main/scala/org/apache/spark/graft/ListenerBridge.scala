package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge into `private[spark] SparkContext.listenerBus` so probe tools
  * can block until every queued listener event has been DELIVERED
  * before detaching their listener — a fixed sleep can silently drop
  * late async events (the round-19 ADVICE item on QueryStats). Same
  * namespace-only pattern as [[org.apache.spark.sql.graft.ColumnBridge]].
  */
object ListenerBridge {

  /** Wait (bounded) until the listener bus queue is empty. */
  def drain(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
