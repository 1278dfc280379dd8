package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for all suites (one JVM-wide session; suites
  * must not stop it). */
object TestSpark {
  lazy val spark: SparkSession = graft.core.Sessions.local(cores = 4, appName = "graft-test")
}
