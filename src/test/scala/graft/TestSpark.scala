package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM (sbt forks a single
  * test JVM; suites must not each spin a session).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    // Force external sorters to spill past 50k elements (read from the
    // SparkEnv conf at sorter creation, so it must be set before the
    // context starts): big sorts in tests exercise the REAL spill path
    // instead of silently fitting in the test JVM's heap.
    sys.props("spark.shuffle.spill.numElementsForceSpillThreshold") = "50000"
    val s = Sessions.build("local[4]", 4, "graft-test")
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
