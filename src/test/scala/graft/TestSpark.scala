package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM (mirrors the
  * reference's single embedded SabotNode per suite — BaseTestQuery.java:125). */
object TestSpark {
  lazy val spark: SparkSession = graft.engine.GraftSession.local(4)
  val sf: String = "/root/testdata/sf0.001"
}
