package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Events

/** Edge-case unit tests for the event operators (the oracle gate covers the
  * statistical bulk; these pin the boundary semantics on crafted data).
  */
class EventsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val t0 = 1700000000L
  private def ev(id: Long, user: Long, epoch: Long, typ: String, value: Double = 1.0) =
    (id, new Timestamp(epoch * 1000), user, typ, value)

  private def df(rows: (Long, Timestamp, Long, String, Double)*) =
    rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("time-weighted average: step-function holding intervals, exact integers") {
    // user 1: 10.00 held 2s, then 20.00 held 1s, last value unweighted
    // twap = (1000c·2e6µs + 2000c·1e6µs) / 3e6µs / 100 = 13.333…
    val out = Events.timeWeightedAvgOn(df(
      ev(1, 1, t0, "view", 10.00),
      ev(2, 1, t0 + 2, "view", 20.00),
      ev(3, 1, t0 + 3, "view", 99.99)))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 3000000L, 4000000000.0 / 3000000 / 100.0)))
  }

  test("events_anomaly: integer 2-sigma identity matches the z-score definition") {
    // user 1: nine 10.00s + one 100.00 → mean 19, sd ≈ 28.5 ⇒ only the
    // 100 is > 2σ out. user 2: constant values ⇒ σ = 0, dev = 0 ⇒ none.
    // user 3: four events < the n ≥ 5 support gate ⇒ excluded entirely.
    val rows =
      (1 to 9).map(i => ev(i, 1, t0 + i, "click", 10.00)) ++
        Seq(ev(10, 1, t0 + 10, "click", 100.00)) ++
        (11 to 16).map(i => ev(i, 2, t0 + i, "click", 7.25)) ++
        (17 to 20).map(i => ev(i, 3, t0 + i, "click", 500.00 * (i - 16)))
    val out = Events.eventsAnomalyOn(df(rows: _*))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 10L, 1L), (2L, 6L, 0L)))
  }

  test("sessionize: gap of exactly 1800s stays in-session; 1801s splits") {
    val sessions = Events.sessionizeOn(df(
      ev(1, 1, t0, "click"),
      ev(2, 1, t0 + 1800, "click"),         // == gap → same session (> 1800 splits)
      ev(3, 1, t0 + 1800 + 1801, "click"),  // > gap → new session
      ev(4, 2, t0, "click")))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (user, seq, n, start, dur) => (user, seq, n, start, dur) }.toSet
    assert(sessions == Set(
      (1L, 1L, 2L, t0, 1800L),
      (1L, 2L, 1L, t0 + 3601, 0L),
      (2L, 1L, 1L, t0, 0L)))
  }

  test("funnel stages are monotonically non-increasing") {
    import spark.implicits._
    val stages = Events.funnel(spark, TestSpark.sf)
      .as[(String, Long)].collect().sortBy(_._1).map(_._2)
    assert(stages.length == 3)
    assert(stages(0) >= stages(1) && stages(1) >= stages(2))
    assert(stages(0) > 0)
  }

  test("cohort retention: offset-0 cell covers every user of its cohort") {
    import spark.implicits._
    val rows = Events.cohortRetention(spark, TestSpark.sf)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall(_._2 >= 0))
    // per cohort, week-0 count must be >= any later-offset count
    rows.groupBy(_._1).foreach { case (_, cells) =>
      val byOffset = cells.map(c => c._2 -> c._3).toMap
      assert(byOffset.contains(0L))
      byOffset.foreach { case (off, n) => if (off > 0) assert(n <= byOffset(0L)) }
    }
  }

  test("asof: purchase matches click at the same instant; none before first click") {
    val out = Events.asofJoinOn(df(
      ev(10, 1, t0, "purchase"),            // before any click → -1
      ev(11, 1, t0 + 60, "click"),
      ev(12, 1, t0 + 60, "purchase"),       // same instant as click → matches it
      ev(13, 1, t0 + 120, "purchase"),      // latest click is still id 11
      ev(14, 2, t0, "purchase")))           // other user, no clicks → -1
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (10L, 1L, -1L, -1L),
      (12L, 1L, 11L, 0L),
      (13L, 1L, 11L, 60L),
      (14L, 2L, -1L, -1L)))
  }

  test("asof: duplicate clicks at one instant dedupe to max event_id") {
    val out = Events.asofJoinOn(df(
      ev(20, 1, t0, "click"),
      ev(21, 1, t0, "click"),               // same instant → keep id 21
      ev(22, 1, t0 + 10, "purchase")))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((22L, 1L, 21L, 10L)))
  }
}
