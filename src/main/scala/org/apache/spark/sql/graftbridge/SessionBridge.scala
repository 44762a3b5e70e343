package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession

/** Stable session identity for JVM-lifetime memo keys.
  *
  * `SparkSession.sessionUUID` is `private[sql]`; memo caches that hold
  * session-bound artifacts (localCheckpoint'd DataFrames) need an
  * identity that is NEVER reused — `System.identityHashCode` can be
  * handed to a later session after the first is collected, which would
  * serve a cached DataFrame bound to a dead session. Same justification
  * boundary as [[ColumnBridge]]: the one sanctioned reach into a
  * `private[sql]` member, from an `org.apache.spark.sql.*` subpackage.
  */
object SessionBridge {
  def sessionUUID(s: SparkSession): String = s match {
    case c: org.apache.spark.sql.classic.SparkSession => c.sessionUUID
    case other => String.valueOf(System.identityHashCode(other))
  }
}
