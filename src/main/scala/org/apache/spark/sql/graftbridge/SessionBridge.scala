package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shim into two `private[sql]` session APIs, used to scope per-query conf
  * overrides (`graft.streaming.Streams.runToMemory`) to a cloned session
  * instead of mutating the caller's — a session-global mutate-and-restore
  * would leak the override to any concurrent query on the same session.
  */
object SessionBridge {

  /** Clone a session: shares the SparkContext and shared state (cache,
    * listeners), copies the session conf and temp views at clone time;
    * conf changes made on the clone afterwards are invisible to the
    * parent. */
  def cloneSession(s: SparkSession): SparkSession =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()

  /** Rebind a DataFrame's logical plan to another session, so execution
    * picks up that session's conf (shuffle partitions, etc.). */
  def rebind(df: DataFrame, to: SparkSession): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      to.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.queryExecution.logical)
}
