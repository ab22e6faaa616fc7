package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Spatial operators: distance joins over planar points via GRID-CELL
  * blocking — the geohash/S2/H3 pattern every geo engine uses, reduced to
  * exact integer arithmetic so the oracle can replay it bit-for-bit.
  *
  * Points are synthesized deterministically from `customer` keys (the
  * fixture has no native geo columns): Knuth/Fibonacci multiplicative
  * hashes place each key on a 100 000 × 100 000 integer grid. A distance
  * join at radius r then becomes: bucket each point into an r-sized cell,
  * replicate the LEFT side to its 3×3 cell neighborhood (a point within r
  * can only live in an adjacent cell — floor is monotone, |Δx| ≤ r ⟹
  * |Δcell| ≤ 1), equi-join on the right side's HOME cell, and verify with
  * the exact squared distance. Candidate volume is N·9·density, never the
  * all-pairs N² the DuckDB oracle brute-forces — the same
  * bounded-candidate shape as [[Dedup]]'s LSH banding, applied to space
  * instead of text.
  *
  * Scale posture: one explode (×9) + one shuffle on (cx, cy); skewed cells
  * (urban cores) are AQE-splittable since the join is a plain equi-join.
  * All coordinates and distances stay in int64 — `dist2 ≤ r²` avoids the
  * sqrt entirely, so no float crosses engines.
  *
  * Reference tie-in: the reference's only join surface is word-key
  * shuffle/merge (`greeter_server.cc:92-110`); a spatial radius join is
  * the canonical "join the engine lacks" that must be COMPOSED from
  * equi-join primitives rather than added as a new physical operator.
  */
object Geo {

  /** Join radius AND cell size, in grid units. 8000 is calibrated to the
    * fixture lattice: the multiplicative-hash points are sparse enough
    * that smaller radii select ZERO pairs at sf0.001 and the smoke gate
    * would pass vacuously (83 pairs at sf0.001, ~16.5k at sf0.01).
    */
  val Radius = 8000L

  /** Grid extent per axis. */
  val Extent = 100000L

  /** Deterministic planar points from customer keys. The grid extent is
    * a parameter so the SCALE PROBE can hold DENSITY constant: with a
    * fixed extent, 10× rows means 10× density and ~100× radius-join
    * pairs BY CONSTRUCTION (a fixture artifact, not an operator
    * property); the probe passes extent ∝ √N so expected neighbors per
    * point — and hence output per input row — is scale-invariant, which
    * is what real-world geo data looks like (cities don't densify 10×
    * because you ingested 10× of the world).
    */
  /** Keys fold into a 2³⁰ domain BEFORE the multiplicative hash: the
    * product then stays ≤ 2³⁰·2.7e9 < 2⁶³, so arbitrarily large surrogate
    * keys (the 100× probe shifts them past 10¹⁰; a real 100 TB table's
    * ids go far beyond) never overflow under ANSI arithmetic. For every
    * fixture key (< 2³⁰) the fold is the identity, so registered results
    * and oracles are unchanged.
    */
  def pointsOn(customers: DataFrame, extent: Long = Extent): DataFrame =
    customers.select(col("c_custkey").as("id"),
      expr(s"((c_custkey % 1073741789) * 2654435761) % $extent").as("x"),
      expr(s"((c_custkey % 1073741789) * 2246822519) % $extent").as("y"))

  /** All point pairs within [[Radius]], found by the 3×3 neighbor-cell
    * equi-join; `id_a < id_b` on the join keeps each pair found exactly
    * once (only the left side replicates, the right stays in its home
    * cell).
    */
  def distancePairs(spark: SparkSession, dir: String): DataFrame =
    distancePairsOn(Tables.customer(spark, dir))

  def distancePairsOn(customers: DataFrame, extent: Long = Extent): DataFrame = {
    val r = Radius
    val pts = pointsOn(customers, extent)
    val left = pts
      .select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"))
      .withColumn("dcx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dcy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("id_a"), col("xa"), col("ya"),
        (expr(s"xa div $r") + col("dcx")).as("cx"),
        (expr(s"ya div $r") + col("dcy")).as("cy"))
    val right = pts.select(col("id").as("id_b"), col("x").as("xb"), col("y").as("yb"),
      expr(s"xb div $r").as("cx"), expr(s"yb div $r").as("cy"))
    val d2 = (col("xb") - col("xa")) * (col("xb") - col("xa")) +
      (col("yb") - col("ya")) * (col("yb") - col("ya"))
    // SHUFFLE join, explicitly: both sides grow ∝ N (points, and the 9×
    // replicated neighborhood), so the 100 TB-right plan partitions both
    // by (cx, cy) and builds the un-replicated home-cell side per
    // partition. Left to its estimates Catalyst BROADCASTS the 9×
    // exploded side (Generate doesn't scale the size estimate) — the
    // probe measured that mis-plan at 24× wall for 10× rows before the
    // hint pinned the shuffle shape (skewed cells stay AQE-splittable,
    // which a broadcast build never is).
    left.join(right.hint("shuffle_hash"), Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b") && d2 <= lit(r * r))
      .select(col("id_a"), col("id_b"), d2.as("dist2"))
  }

  /** Per-point neighborhood summary: how many neighbors within [[Radius]]
    * and the nearest squared distance — the density/proximity feature a
    * geo-ML pipeline derives per entity. Same cell join, both orientations
    * (every point is a left once), no argmin so no tie-break crosses
    * engines.
    */
  def nearestSummary(spark: SparkSession, dir: String): DataFrame =
    nearestSummaryOn(Tables.customer(spark, dir))

  def nearestSummaryOn(customers: DataFrame, extent: Long = Extent): DataFrame = {
    val pairs = distancePairsOn(customers, extent)
    pairs.select(col("id_a").as("id"), col("dist2"))
      .unionAll(pairs.select(col("id_b").as("id"), col("dist2")))
      .groupBy("id")
      .agg(count(lit(1)).as("n_neighbors"), min("dist2").as("min_dist2"))
  }

  /** GREAT-CIRCLE (haversine) distance — the spherical-earth counterpart
    * to the planar family: the integer lattice maps to lat ∈ [−85, 85],
    * lon ∈ [−180, 180), every customer's distance to a fixed reference
    * point is computed with the standard haversine formula, and distances
    * band into 1000 km buckets. This is the one geo query where FLOAT
    * trig crosses engines (both compute in IEEE double; band boundaries
    * would need a distance within ~1e-9 km of a band edge to flip —
    * negligible on hashed points; the in-band average rounds to 2 dp).
    * Per-row map-side math + one small aggregate: embarrassingly
    * parallel at any scale.
    */
  def haversineBands(spark: SparkSession, dir: String): DataFrame =
    pointsOn(Tables.customer(spark, dir))
      .select(col("id"),
        (col("x") / Extent * 170.0 - 85.0).as("lat"),
        (col("y") / Extent * 360.0 - 180.0).as("lon"))
      .withColumn("dist_km", expr(
        """2 * 6371.0088 * asin(sqrt(
          |  pow(sin(radians(lat - 40.7128) / 2), 2) +
          |  cos(radians(lat)) * cos(radians(40.7128)) *
          |  pow(sin(radians(lon - (-74.006)) / 2), 2)))""".stripMargin))
      .groupBy(floor(col("dist_km") / 1000).cast("long").as("band_1000km"))
      .agg(count(lit(1)).as("n_customers"), round(avg("dist_km"), 2).as("avg_km"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "geo_haversine" -> haversineBands _,
    "geo_distance_join" -> distancePairs _,
    "geo_nearest_summary" -> nearestSummary _,
  )

  private val pointsCte: String =
    s"""p AS (
       |  SELECT c_custkey AS id,
       |   ((c_custkey % 1073741789) * 2654435761) % $Extent AS x,
       |   ((c_custkey % 1073741789) * 2246822519) % $Extent AS y
       |  FROM customer)""".stripMargin

  // the oracle brute-forces all pairs — the Spark side must reach the
  // same set through the bounded cell join
  def oracle: Map[String, String] = Map(
    // same lattice→sphere mapping and haversine formula, IEEE double
    "geo_haversine" ->
      s"""WITH p AS (
        |  SELECT c_custkey AS id,
        |    ((c_custkey * 2654435761) % $Extent) / $Extent.0 * 170.0 - 85.0 AS lat,
        |    ((c_custkey * 2246822519) % $Extent) / $Extent.0 * 360.0 - 180.0 AS lon
        |  FROM customer
        |), d AS (
        |  SELECT id, 2 * 6371.0088 * asin(sqrt(
        |    pow(sin(radians(lat - 40.7128) / 2), 2) +
        |    cos(radians(lat)) * cos(radians(40.7128)) *
        |    pow(sin(radians(lon - (-74.006)) / 2), 2))) AS dist_km
        |  FROM p
        |)
        |SELECT floor(dist_km / 1000)::BIGINT AS band_1000km,
        | count(*) AS n_customers, round(avg(dist_km), 2) AS avg_km
        |FROM d GROUP BY 1""".stripMargin,
    "geo_distance_join" ->
      s"""WITH $pointsCte
         |SELECT a.id AS id_a, b.id AS id_b,
         | ((b.x-a.x)*(b.x-a.x) + (b.y-a.y)*(b.y-a.y))::BIGINT AS dist2
         |FROM p a JOIN p b ON a.id < b.id
         |WHERE (b.x-a.x)*(b.x-a.x) + (b.y-a.y)*(b.y-a.y) <= ${Radius * Radius}""".stripMargin,
    "geo_nearest_summary" ->
      s"""WITH $pointsCte,
         |pairs AS (
         |  SELECT a.id AS id_a, b.id AS id_b,
         |   ((b.x-a.x)*(b.x-a.x) + (b.y-a.y)*(b.y-a.y))::BIGINT AS dist2
         |  FROM p a JOIN p b ON a.id < b.id
         |  WHERE (b.x-a.x)*(b.x-a.x) + (b.y-a.y)*(b.y-a.y) <= ${Radius * Radius}),
         |sides AS (
         |  SELECT id_a AS id, dist2 FROM pairs
         |  UNION ALL SELECT id_b AS id, dist2 FROM pairs)
         |SELECT id, count(*)::BIGINT AS n_neighbors, min(dist2) AS min_dist2
         |FROM sides GROUP BY id""".stripMargin,
  )
}
