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
    // local[4,2]: allow ONE task retry (production runs maxFailures=4;
    // plain local[N] pins it to 1) so FaultToleranceSpec can inject a
    // transient task failure and prove the reassignment path end-to-end.
    val s = Sessions.build("local[4,2]", 4, "graft-test")
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
