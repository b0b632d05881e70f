package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Bridge to the live `SparkContext.conf` (`private[spark]`): the
  * mutable SparkConf that NEW SQL sessions merge into their fresh
  * SQLConf at SessionState build time. The wire server needs it because
  * each JDBC connection gets `sqlContext.newSession()` — a runtime
  * session-conf set on the parent session does not propagate there,
  * only context-conf entries do. Same extension-library technique as
  * [[org.apache.spark.sql.graftshim.SqlShims]]. */
object CoreShims {
  def setContextConf(sc: SparkContext, key: String, value: String): Unit =
    sc.conf.set(key, value): Unit

  /** Drain the listener bus (`private[spark]`): block until every event
    * posted so far has been delivered to every listener. [[graft.Profile]]
    * reads listener-built per-stage aggregates right after an action
    * returns — without the drain, trailing stage-completion events land
    * after the read (or after the clear, bleeding into the next run). */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
