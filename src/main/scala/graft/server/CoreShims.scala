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
}
