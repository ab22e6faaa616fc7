package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM (sbt forks a single
  * test JVM; suites must not each spin a session).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Sessions.build("local[4]", 4, "graft-test")
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
