package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics

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

  test("bloom probe: no false negatives, fp rate within bound") {
    val row = Analytics.bloomProbe(spark, TestSpark.sf).collect().head
    assert(row.getAs[Boolean]("no_false_negatives"))
    assert(row.getAs[Boolean]("fp_rate_bounded"))
    assert(row.getAs[Long]("n_probes") == 2 * row.getAs[Long]("n_present"))
  }
}
