package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** TYPED Dataset API surface — `KeyValueGroupedDataset.cogroup` and
  * `flatMapSortedGroups`, the two grouped-iterator operators the rest of
  * the registry doesn't touch (the streaming side covers
  * `mapGroupsWithState`/`transformWithState`; the batch typed operators
  * get their own verified queries here).
  *
  * Reference scope: the reference's Reducer RPC body
  * (`greeter_server.cc:92-110`) is exactly a per-key iterator function —
  * these queries are that surface exposed as the user-facing typed API,
  * with Spark doing the grouping/sorting the reference hand-rolled.
  *
  * Scale posture — stated honestly: cogroup shuffles BOTH sides on the
  * key and hands the planner an opaque lambda, so Catalyst cannot push,
  * prune, or reorder through it; the declarative join/aggregate twin is
  * the right default (and is what the oracle states). These operators
  * earn their place where per-key logic genuinely needs an imperative
  * iterator (sequence alignment, custom sessionization, per-key state
  * machines): per-key state is O(1) here, `flatMapSortedGroups` gets
  * sort-within-partitions from the shuffle's secondary sort rather than
  * buffering groups, and nothing ever collects to the driver.
  */
object Typed {

  case class CustRow(c_custkey: Long, c_mktsegment: String)
  case class OrderRow(o_custkey: Long, o_totalprice: Double)
  case class CustOrders(c_custkey: Long, c_mktsegment: String, n_orders: Long, cents_total: Long)

  /** Per-customer order reconciliation via typed COGROUP: both sides
    * shuffle on the customer key; the lambda sees (key, customers,
    * orders) iterators and streams one output row per customer — order
    * count and exact total cents, zero for order-less customers (the
    * left-outer semantic, expressed imperatively). The oracle is the
    * declarative twin: LEFT JOIN + aggregate.
    */
  def typedCogroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
      .select("c_custkey", "c_mktsegment").as[CustRow]
    val ords = Tables.orders(spark, dir)
      .select("o_custkey", "o_totalprice").as[OrderRow]
    cust.groupByKey(_.c_custkey)
      .cogroup(ords.groupByKey(_.o_custkey)) { (k, cs, os) =>
        cs.map { c =>
          var n = 0L
          var cents = 0L
          os.foreach { o => n += 1; cents += math.round(o.o_totalprice * 100) }
          CustOrders(k, c.c_mktsegment, n, cents)
        }
      }
      .toDF()
  }

  case class Ev(user_id: Long, event_id: Long, ts: Timestamp)
  case class UserGaps(user_id: Long, n_events: Long, n_long_gaps: Long, max_gap_us: Long)

  /** Per-user inter-event gap profile via `flatMapSortedGroups` — the
    * typed secondary-sort surface: Spark sorts each group WITHIN the
    * shuffle (no group buffering, unlike sort-inside-lambda), and the
    * iterator carries O(1) state (previous timestamp) per key. Timestamps
    * are exact integer MICROSECONDS on both engines (`epoch_us` oracle
    * side), so no float time math crosses the gate. Long gap = > 1 hour.
    */
  def typedSortedGroups(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select("user_id", "event_id", "ts").as[Ev]
    ev.groupByKey(_.user_id)
      .flatMapSortedGroups($"ts".asc, $"event_id".asc) { (k, it) =>
        var n = 0L
        var prevUs = 0L
        var longGaps = 0L
        var maxGap = 0L
        it.foreach { e =>
          val us = Math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
          if (n > 0) {
            val g = us - prevUs
            if (g > 3600L * 1000000L) longGaps += 1
            if (g > maxGap) maxGap = g
          }
          prevUs = us
          n += 1
        }
        Iterator.single(UserGaps(k, n, longGaps, maxGap))
      }
      .toDF()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "typed_cogroup" -> typedCogroup _,
    "typed_sorted_groups" -> typedSortedGroups _,
  )

  def oracle: Map[String, String] = Map(
    // the declarative twin of the cogroup lambda
    "typed_cogroup" ->
      """SELECT c.c_custkey, c.c_mktsegment,
        | count(o.o_orderkey)::BIGINT AS n_orders,
        | coalesce(sum(round(o.o_totalprice * 100)::BIGINT), 0)::BIGINT AS cents_total
        |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY 1, 2""".stripMargin,
    // lag-window twin of the sorted-iterator state machine
    "typed_sorted_groups" ->
      """WITH g AS (
        |  SELECT user_id,
        |   epoch_us(ts::TIMESTAMP) - lag(epoch_us(ts::TIMESTAMP)) OVER (
        |     PARTITION BY user_id ORDER BY ts::TIMESTAMP ASC, event_id ASC) AS gap
        |  FROM events)
        |SELECT user_id, count(*)::BIGINT AS n_events,
        | coalesce(sum(CASE WHEN gap > 3600000000 THEN 1 ELSE 0 END), 0)::BIGINT AS n_long_gaps,
        | coalesce(max(gap), 0)::BIGINT AS max_gap_us
        |FROM g GROUP BY user_id""".stripMargin,
  )
}
