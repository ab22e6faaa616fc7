package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics
import graft.sources.Tables

class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("copurchase pairs: within-order pairs once, shared pairs counted across orders") {
    val li = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),          // order 1: parts 10,20,30
      (2L, 10L), (2L, 20L),                     // order 2: parts 10,20
      (2L, 20L),                                // duplicate line, same part
      (3L, 40L))                                // singleton basket: no pairs
      .toDF("l_orderkey", "l_partkey")
    val out = Analytics.copurchasePairsOn(li)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((10L, 20L, 2L), (10L, 30L, 1L), (20L, 30L, 1L)))
  }

  test("attribution: last preceding view wins; no-view and out-of-window are unattributed") {
    val events = Seq(
      // user 1: view at 100, view at 200, purchase at 300 -> attributed to 200
      (1L, ts(100), 1L, "view"), (2L, ts(200), 1L, "view"), (3L, ts(300), 1L, "purchase"),
      // user 2: purchase with no prior view (view comes after)
      (4L, ts(100), 2L, "purchase"), (5L, ts(200), 2L, "view"),
      // user 3: view 8 days before purchase -> outside the 7-day window
      (6L, ts(0), 3L, "view"), (7L, ts(8 * 86400), 3L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Analytics.attributionLastTouchOn(events)
      .select("event_id", "last_view_us", "attributed")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getBoolean(2))).toMap
    assert(out(3L) == (Some(200L * 1000000), true))
    assert(out(4L) == (None, false))
    assert(out(7L) == (Some(0L), false))
  }

  test("cdc apply: updates override inserts, tombstones delete") {
    val orders = Seq(
      (5L, 100.00),   // untouched -> version 1
      (7L, 200.00),   // %7 -> updated, version 2, cents+1000
      (13L, 300.00),  // %13 -> deleted
      (91L, 400.00))  // %7 AND %13 -> delete wins (version 3)
      .toDF("o_orderkey", "o_totalprice")
    val out = Analytics.cdcLatestOn(orders)
      .as[(Long, Int, Long)].collect().toSet
    assert(out == Set((5L, 1, 10000L), (7L, 2, 21000L)))
  }

  test("mode agg: deterministic tie-break by value") {
    val orders = Seq(
      (1L, 1L, "2-HIGH"), (2L, 1L, "2-HIGH"), (3L, 2L, "5-LOW"),
      (5L, 3L, "1-URGENT"))  // nation 20: tie between 5-LOW and 1-URGENT -> 1-URGENT
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val customer = Seq((1L, 10L), (2L, 20L), (3L, 20L)).toDF("c_custkey", "c_nationkey")
    val out = Analytics.aggModeOn(orders, customer)
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set((10L, "2-HIGH", 2L), (20L, "1-URGENT", 1L)),
      "tied counts must break by priority value")
  }

  test("skyline: bin decomposition handles within-bin and cross-bin domination") {
    val part = Seq(
      (1L, 50.0, 10),    // frontier (cheapest)
      (2L, 60.0, 9),     // dominated within bin 0 by (50, 10)
      (3L, 80.0, 15),    // frontier (bigger than everything cheaper)
      (4L, 150.0, 12),   // dominated ACROSS bins by (80, 15)
      (5L, 150.0, 20),   // frontier; same price as a dominated row
      (6L, 150.0, 18),   // collapsed: same price, smaller size
      (7L, 260.0, 20))   // dominated: equal size at higher price is NOT on the frontier
      .toDF("p_partkey", "p_retailprice", "p_size")
    val out = Analytics.skyline2dOn(part).as[(Double, Int)].collect().toSet
    assert(out == Set((50.0, 10), (80.0, 15), (150.0, 20)))
  }

  test("one-hot: each row sets exactly one bit per category family") {
    val out = Analytics.featureOnehot(spark, TestSpark.sf)
    val arr = out.collect()
    assert(arr.nonEmpty)
    arr.foreach { r =>
      assert((1 to 5).map(r.getInt).sum == 1, "priority family must one-hot")
      assert((6 to 8).map(r.getInt).sum == 1, "status family must one-hot")
    }
  }

  test("target encode: encoded value is the exact per-category mean") {
    val out = Analytics.featureTargetEncode(spark, TestSpark.sf)
      .select("o_orderpriority", "target_cents", "enc_mean")
      .as[(String, Long, Double)].collect()
    val byCat = out.groupBy(_._1)
    byCat.foreach { case (_, rows) =>
      val mean = rows.map(_._2).sum.toDouble / rows.size
      assert(rows.forall(_._3 == mean))
    }
  }

  test("rfm: quartile scores are in 1..4 and near-balanced") {
    val out = Analytics.userRfm(spark, TestSpark.sf)
      .select("r_score", "f_score", "m_score").as[(Int, Int, Int)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (r, f, m) => Seq(r, f, m).forall(s => s >= 1 && s <= 4) })
    val sizes = out.map(_._1).groupBy(identity).values.map(_.size)
    assert(sizes.max - sizes.min <= 1, "ntile buckets must differ by at most 1")
  }

  test("mixture weights: 3:1 token split gives uniform-target weights 2/3 and 2") {
    val docs = Seq(
      (1L, "a b c d e f", "big"),    // 6 tokens
      (2L, "a b", "small"))          // 2 tokens
      .toDF("doc_id", "text", "source")
    val out = Analytics.corpusMixtureWeightsOn(docs)
      .select("source", "n_tokens", "share", "weight", "epochs")
      .as[(String, Long, Double, Double, Long)].collect()
      .map { case (s, t, sh, w, e) => s -> ((t, sh, w, e)) }.toMap
    assert(out("big") == (6L, 0.75, 8.0 / 12, 1L))
    assert(out("small") == (2L, 0.25, 2.0, 2L))
  }

  test("length buckets: bucket = binary digit count of token count") {
    val docs = Seq((1L, "w"), (2L, "w w"), (3L, "w w w"), (4L, "w w w w"))
      .toDF("doc_id", "text")
    val out = Analytics.lengthBucketsOn(docs)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 1L, 1L, 1L, 1L),    // 1 token  -> bucket 1
      (2L, 2L, 5L, 2L, 3L),    // 2,3      -> bucket 2
      (3L, 1L, 4L, 4L, 4L)))   // 4        -> bucket 3
  }

  test("zonemap audit: date-clustered layout prunes at least as much as key-chunked") {
    val out = Analytics.zonemapPruneStats(spark, TestSpark.sf)
      .select("layout", "n_pruned", "rows_scanned", "rows_total")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val kc = out("key_chunked"); val dc = out("date_clustered")
    assert(kc._4 == dc._4, "both layouts cover the same rows")
    assert(dc._2 >= kc._2, "clustering can only improve pruning")
    assert(dc._3 <= kc._3)
  }

  test("incremental join merge equals the monolithic join recompute") {
    val orders = (1L to 40L).map(k => (k, if (k % 3 == 0) "F" else "O"))
      .toDF("o_orderkey", "o_orderstatus")
    val li = (1L to 40L).flatMap(k => Seq((k, 1, 10.0), (k, 2, 20.0)))
      .toDF("l_orderkey", "l_linenumber", "l_extendedprice")
    val inc = Analytics.incrementalJoinMergeOn(orders, li)
      .as[(String, Long, Long)].collect().toSet
    val full = orders.join(li, $"o_orderkey" === $"l_orderkey")
      .groupBy("o_orderstatus")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.round($"l_extendedprice" * 100)
            .cast("long")).as("cents"))
      .as[(String, Long, Long)].collect().toSet
    assert(inc == full)
  }

  test("m4 downsample: min/max/first/last per series-hour") {
    val events = Seq(
      (1L, ts(100), 1L, "view", 5.00),
      (2L, ts(200), 1L, "view", 1.00),   // min
      (3L, ts(300), 1L, "view", 9.00),   // max
      (4L, ts(400), 1L, "view", 7.00),   // last
      (5L, ts(4000), 1L, "view", 3.00))  // second hour
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Analytics.m4DownsampleOn(events)
      .select("hr", "n", "min_cents", "max_cents", "first_cents", "last_cents")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set((0L, 4L, 100L, 900L, 500L, 700L), (1L, 1L, 300L, 300L, 300L, 300L)))
  }

  test("exact median via histogram: odd and even group sizes interpolate correctly") {
    val events = Seq(
      (1L, ts(1), 1L, "a", 1.00), (2L, ts(2), 1L, "a", 2.00), (3L, ts(3), 1L, "a", 3.00),
      (4L, ts(1), 1L, "b", 1.00), (5L, ts(2), 1L, "b", 2.00),
      (6L, ts(3), 1L, "b", 3.00), (7L, ts(4), 1L, "b", 4.00))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Analytics.exactMedianHistogramOn(events)
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("a") == (3L, 200.0))   // odd: middle value
    assert(out("b") == (4L, 250.0))   // even: halfway between 200 and 300
  }

  test("range split points: uniform histogram cuts at exact rank boundaries") {
    // 8 distinct values, 4 parts -> ceil ranks 2,4,6 -> split values 2,4,6
    val orders = (1L to 8L).map(v => (v, v.toDouble / 100))
      .toDF("o_orderkey", "o_totalprice")
    val out = Analytics.rangeSplitPointsOn(orders, parts = 4)
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (2L, 4L), (3L, 6L)))
  }

  test("secondary sort runs: strictly-increasing runs per user, equal values break") {
    val events = Seq(
      (1L, ts(1), 1L, "view", 1.00), (2L, ts(2), 1L, "view", 2.00),
      (3L, ts(3), 1L, "view", 3.00), (4L, ts(4), 1L, "view", 1.00),
      (5L, ts(5), 1L, "view", 2.00),
      (6L, ts(1), 2L, "view", 5.00), (7L, ts(2), 2L, "view", 5.00),  // equal -> break
      (8L, ts(3), 2L, "view", 4.00),
      (9L, ts(1), 3L, "view", 7.00))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Analytics.secondarySortRunsOn(events)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == (5L, 3L))
    assert(out(2L) == (3L, 1L))
    assert(out(3L) == (1L, 1L))
  }

  test("graph communities: triangle converges, pendant pair oscillates deterministically") {
    val li = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 4L), (20L, 5L))
      .toDF("l_orderkey", "l_partkey")
    val out = Analytics.graphCommunitiesOn(li)
      .as[(Long, Long)].collect().toMap
    // triangle {1,2,3}: round 1 -> (2,1,1), round 2 -> all 1
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L)
    // 2-cycle {4,5}: synchronized LPA swaps labels each round
    assert(out(4L) == 4L && out(5L) == 5L)
  }

  test("conversion latency: converted, never-purchased, and purchase-first users") {
    val events = Seq(
      (1L, ts(100), 1L, "view", 0.0), (2L, ts(400), 1L, "purchase", 0.0),
      (3L, ts(100), 2L, "view", 0.0),
      (4L, ts(100), 3L, "purchase", 0.0), (5L, ts(200), 3L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Analytics.conversionLatencyOn(events)
      .select("user_id", "converted", "latency_us")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(out(1L) == (true, Some(300L * 1000000)))
    assert(out(2L) == (false, None))
    assert(out(3L) == (false, None), "purchase before first view is not a conversion")
  }

  test("merkle chunks: a single-row change flags exactly one chunk") {
    val mk = (k: Long, price: Double) =>
      (k, k % 10, "O", price, ts(1000), "1-URGENT")
    val base = ((1L to 2500L).map(mk(_, 100.0)))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
    val repl = ((1L to 2500L).map(k => mk(k, if (k == 42L) 999.0 else 100.0)))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
    val b = Analytics.merkleChunksOn(base).as[(Long, Long, Long)].collect()
      .map { case (c, n, h) => c -> ((n, h)) }.toMap
    val r = Analytics.merkleChunksOn(repl).as[(Long, Long, Long)].collect()
      .map { case (c, n, h) => c -> ((n, h)) }.toMap
    assert(b.keySet == r.keySet)
    val diverged = b.keySet.filter(c => b(c) != r(c))
    assert(diverged == Set(0L), s"only the chunk holding key 42 may diverge, got $diverged")
  }

  test("partition balance: buckets partition rows and keys exactly") {
    val out = Analytics.partitionBalance(spark, TestSpark.sf)
      .select("n_keys", "n_rows", "balance_ratio")
      .as[(Long, Long, Double)].collect()
    val total = out.map(_._2).sum
    assert(math.abs(out.map(_._3).sum - 32.0) < 1e-9, "ratios must sum to bucket count")
    val distinctUsers = graft.sources.Tables.events(spark, TestSpark.sf)
      .select("user_id").distinct().count()
    assert(out.map(_._1).sum == distinctUsers, "each key lands in exactly one bucket")
    assert(total == graft.sources.Tables.events(spark, TestSpark.sf).count())
  }

  test("bloom probe: no false negatives, fp rate within bound") {
    val row = Analytics.bloomProbe(spark, TestSpark.sf).collect().head
    assert(row.getAs[Boolean]("no_false_negatives"))
    assert(row.getAs[Boolean]("fp_rate_bounded"))
    assert(row.getAs[Long]("n_probes") == 2 * row.getAs[Long]("n_present"))
  }

  test("theta sketch setops: exact columns are truth; estimates land in the KMV error band") {
    val row = Analytics.thetaSketchSetops(spark, TestSpark.sf).collect().head
    val (ea, eb, eu, ei) = (row.getAs[Long]("exact_a"), row.getAs[Long]("exact_b"),
      row.getAs[Long]("exact_union"), row.getAs[Long]("exact_intersect"))
    // set identities the exact audit must satisfy
    assert(ea + eb - ei == eu, "inclusion-exclusion must hold on the exact columns")
    assert(ei <= math.min(ea, eb) && eu >= math.max(ea, eb))
    // KMV estimates: σ ≈ est/√(k−2); allow 4σ — deterministic draws, so
    // this is a fixed-fixture regression bound, not a flaky statistical one
    def inBand(est: Double, exact: Long): Unit =
      assert(math.abs(est - exact) <= 4.0 * exact / math.sqrt(Analytics.ThetaK - 2.0),
        s"estimate $est too far from exact $exact")
    inBand(row.getAs[Double]("est_a"), ea)
    inBand(row.getAs[Double]("est_b"), eb)
    inBand(row.getAs[Double]("est_union"), eu)
    inBand(row.getAs[Double]("est_intersect"), ei)
  }

  test("theta sketch construction prunes to k rows map-side (WindowGroupLimit)") {
    val p = Analytics.thetaSketchSetops(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      "the per-set top-k-by-hash must prune before the exchange, not sort whole sets")
  }

  test("assoc rules: exact ppm confidence and lift; support floor; duplicate lines collapse") {
    val li = Seq(
      (1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 20L), (2L, 20L), // duplicate basket line must not double-count
      (3L, 10L),
      (4L, 20L), (4L, 30L))
      .toDF("l_orderkey", "l_partkey")
    val out = Analytics.assocRulesOn(li)
      .select("antecedent", "consequent", "pair_cnt", "a_cnt", "b_cnt", "conf_ppm", "lift_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    // 4 baskets; item counts 10→3, 20→3, 30→1; only {10,20} reaches support 2.
    // conf = 2·10⁶ div 3 = 666666; lift = 2·4·10⁶ div (3·3) = 888888.
    assert(out == Set(
      (10L, 20L, 2L, 3L, 3L, 666666L, 888888L),
      (20L, 10L, 2L, 3L, 3L, 666666L, 888888L)))
  }

  test("negative sampling: probes never hit interactions, at most 3 per user, item domain respected") {
    val out = Analytics.negativeSampling(spark, TestSpark.sf)
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val interactions = Tables.orders(spark, TestSpark.sf).select(col("o_custkey"), col("o_orderkey"))
      .join(Tables.lineitem(spark, TestSpark.sf), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .as[(Long, Long)].collect().toSet
    val nItems = Tables.part(spark, TestSpark.sf).count()
    assert(out.forall { case (u, _, item) => !interactions.contains((u, item)) },
      "a sampled negative collided with a real interaction")
    assert(out.forall { case (_, _, item) => item >= 0 && item < nItems })
    val perUser = out.groupBy(_._1).values.map(_.length)
    assert(perUser.forall(_ <= 3) && perUser.exists(_ == 3))
  }
}
