package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: these are the failure modes that would
  * silently zero a round's correctness score, so they fail the build
  * instead.
  */
class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("every registered query has a DuckDB oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"rows-only queries (no oracle): $missing")
  }

  test("no orphan oracles (oracle without a query)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("module registries never collide (Map ++ would silently drop one)") {
    val total = SparkEntry.modules.map(_._1.size).sum
    assert(total == SparkEntry.queries.size,
      s"query-name collision across modules: $total module entries vs ${SparkEntry.queries.size} merged")
    val totalOracle = SparkEntry.modules.map(_._2.size).sum
    assert(totalOracle == SparkEntry.oracleSql.size,
      "oracle-name collision across modules")
  }

  test("every query's output schema has unique column names (hash compare requires it)") {
    // schema only — builds/analyzes each plan; the one streaming entry
    // actually runs (bounded, seconds at sf0.001)
    SparkEntry.queries.foreach { case (name, fn) =>
      val cols = fn(spark, TestSpark.sf).schema.map(_.name)
      assert(cols.distinct.size == cols.size, s"$name: duplicate columns $cols")
      assert(cols.nonEmpty, s"$name: empty schema")
    }
  }

  test("flagship entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
