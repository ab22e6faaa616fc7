package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Geo
import graft.sources.Tables

class GeoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = TestSpark.sf

  test("cell-blocked distance join equals brute force and finds each pair once") {
    val customers = Tables.customer(spark, sf)
    val cellPairs = Geo.distancePairsOn(customers).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // brute force over the same synthesized points
    val pts = Geo.pointsOn(customers).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val r2 = Geo.Radius * Geo.Radius
    val brute = (for {
      (ia, xa, ya) <- pts
      (ib, xb, yb) <- pts
      if ia < ib
      d2 = (xb - xa) * (xb - xa) + (yb - ya) * (yb - ya)
      if d2 <= r2
    } yield (ia, ib, d2)).toSet

    assert(brute.nonEmpty, "fixture produced no pairs — spec is vacuous")
    assert(cellPairs.length == cellPairs.toSet.size, "pair found more than once")
    assert(cellPairs.toSet == brute)
  }

  test("nearest summary counts both orientations of every pair") {
    val customers = Tables.customer(spark, sf)
    val nPairs = Geo.distancePairsOn(customers).count()
    val summary = Geo.nearestSummaryOn(customers)
    val total = summary.agg(coalesce(sum("n_neighbors"), lit(0L))).head().getLong(0)
    assert(total == 2 * nPairs)
    assert(summary.filter(col("min_dist2") > Geo.Radius * Geo.Radius).count() == 0)
  }
}
