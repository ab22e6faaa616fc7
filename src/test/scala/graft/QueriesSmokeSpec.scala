package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must run and return rows on the smoke fixture,
  * and every oracle entry must point at a registered query.
  */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are all registered queries") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without queries: $unknown")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs with rows > 0 on sf0.001") {
      assert(fn(spark, TestSpark.sf).count() > 0, s"$name returned 0 rows")
    }
  }
}
