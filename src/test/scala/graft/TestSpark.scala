package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM — Spark startup
  * is ~5 s, so per-suite sessions would dominate test time. Suites must not
  * mutate session state beyond what GraftSession.tune pins.
  */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local("graft-test", 8)

  /** Smallest driver-generated SF — correctness, not throughput. */
  val sf = "/root/testdata/sf0.001"
}
