package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Event-stream analytics in batch form: window functions (ranking,
  * analytic, running frames), event-time tumbling windows, and
  * gaps-and-islands sessionization. The Structured Streaming twins live in
  * [[graft.streaming.EventStreams]]; these batch forms are the
  * oracle-verifiable surface.
  *
  * Scale posture: every window here is partitioned by a high-cardinality key
  * (`user_id`, `o_custkey`) — state per partition is one user's events, so
  * the plan is a single hash exchange + in-partition sort, no global sort,
  * no driver state. Timestamps are compared/emitted as epoch values computed
  * identically in Spark and DuckDB (µs-precision doubles, floored to long
  * only in final outputs).
  */
object Events {

  /** Epoch seconds with µs fraction — matches DuckDB `epoch(ts)`. */
  private val tsd = col("ts").cast("double")

  /** Tumbling event-time window (1 h) per event type. */
  def tumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))

  /** Sliding event-time window (1 h window, 30 min slide) per event type —
    * Spark's native `window()` generator: each event lands in exactly
    * window/slide = 2 overlapping windows, materialized BEFORE the exchange
    * (a bounded 2× row expansion, the sliding-window analog of rollup's
    * Expand), then one (window, type) aggregate. Window starts align to the
    * epoch-0 slide grid on both engines.
    */
  def sliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(
        unix_timestamp(col("window.start")).as("win_epoch"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Distinct-user reach per sliding window — the dashboard "unique
    * visitors per rolling hour". countDistinct rides the same bounded 2×
    * window Expand as [[sliding]], then a two-phase distinct aggregate.
    * At 100 TB reach goes approximate: `approx_count_distinct` (HLL)
    * per window is one pass with fixed memory and re-mergeable across
    * refreshes — the agg_hll_mergeable trade, with this exact form as
    * the verification anchor.
    */
  def slidingDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(countDistinct("user_id").as("n_users"), count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("window.start")).as("win_epoch"),
        col("n_users"), col("n_events"))

  /** Ranking window: top-3 orders per customer by price. */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
  }

  /** Running-total frame per user (rows unbounded-preceding..current). */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("running_value", round(sum("value").over(w), 2))
      .drop("value", "ts")
  }

  /** Analytic lag: per-user delta between consecutive event values. */
  def windowLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("delta", round(col("value") - lag("value", 1).over(w), 2))
      .drop("value", "ts")
  }

  /** Gaps-and-islands sessionization: a >30 min silence starts a new
    * session; emits per-session stats. This is the batch twin of streaming
    * `session_window` (see [[graft.streaming.EventStreams]]).
    */
  /** Time-weighted average (TWAP) of `value` per user: each observation
    * holds until the next one, weighted by its holding interval. All in
    * EXACT integers — cents (`round(value·100)`, integral by construction)
    * × microseconds — so the only doubles are two final divisions of
    * identical integers: the float-sum ordering hazard never arises.
    * One lead window + one aggregate, both on the user_id partitioning.
    */
  /** Inter-arrival-time distribution: per-user event gaps in whole
    * seconds, bucketed by DECIMAL DECADE (digit count of the integer gap:
    * 1 = under 10 s, 2 = under 100 s, …) — the log-scale histogram every
    * latency/traffic analysis starts with, with the log replaced by an
    * exact string-length so no transcendental crosses engines.
    */
  def gapHistogram(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag("us", 1).over(w))
      .filter(col("prev_us").isNotNull)
      .select(expr("(us - prev_us) div 1000000").as("gap_s"))
      .groupBy(length(col("gap_s").cast("string")).cast("long").as("decade"))
      .agg(count(lit(1)).as("n"), min("gap_s").as("min_gap_s"), max("gap_s").as("max_gap_s"))
  }

  /** First-order Markov transition matrix over the per-user event-type
    * sequence: P(next | current) estimated from adjacent pairs — the
    * behavioral model behind next-action prediction, funnel synthesis, and
    * bot detection. One `lead` window per user builds the pair stream
    * (shuffle on user_id), the transition counts aggregate on the tiny
    * (cur, nxt) matrix (≤ |types|² rows), and the row-normalizing total is
    * a window over that matrix — no second scan of the facts. The single
    * float op is the final probability division, rounded to 4 dp on both
    * engines.
    */
  def markovTransitions(spark: SparkSession, dir: String): DataFrame =
    markovTransitionsOn(Tables.events(spark, dir))

  def markovTransitionsOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type").as("cur"))
      .withColumn("nxt", lead(col("cur"), 1).over(w))
      .filter(col("nxt").isNotNull)
    val counts = pairs.groupBy("cur", "nxt").agg(count(lit(1)).as("n"))
    counts.select(col("cur"), col("nxt"), col("n"),
      round(col("n") / sum("n").over(Window.partitionBy("cur")), 4).as("p"))
  }

  /** Feature standardization — per-group z-score and min-max scaling of
    * `value`, the ML-pipeline preprocessing step. Group moments are exact
    * integer sums in cents (the `events_anomaly` pattern); the per-row
    * scalings are fixed expression trees over those integers whose only
    * float ops are division, multiplication, and sqrt — all IEEE
    * correctly-rounded (unlike ln/pow), so both engines produce the
    * identical doubles. Moment table broadcasts; one scan + one agg.
    */
  def featureScaling(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), round(col("value") * 100).cast("long").as("v"))
    val st = c.groupBy("event_type").agg(
      count(lit(1)).as("n"), sum("v").as("s"), sum(col("v") * col("v")).as("ss"),
      min("v").as("mn"), max("v").as("mx"))
    c.join(broadcast(st), "event_type")
      .select(col("event_id"), col("event_type"),
        ((col("n") * col("v") - col("s")).cast("double")
          / (col("n") * sqrt((col("n") * col("ss") - col("s") * col("s")).cast("double")
              / (col("n") * (col("n") - 1))))).as("zscore"),
        when(col("mx") > col("mn"),
          (col("v") - col("mn")).cast("double") / (col("mx") - col("mn"))).as("minmax"))
  }

  /** Rank-based normalization — the distribution-free companion to
    * [[featureScaling]]: each value's percent_rank within its event type
    * ((rank−1)/(n−1), an exact integer ratio — immune to outliers and to
    * float-moment hazards alike). One window per group partition.
    */
  def rankNormalize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("value").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("pct_rank", percent_rank().over(w))
  }

  /** Day-of-week × hour activity heatmap — the traffic-shape profile.
    * Day numbering pinned to ISO (1 = Monday) explicitly on both engines,
    * since their native `dayofweek` conventions differ (Spark 1 = Sunday,
    * DuckDB 0 = Sunday). One count aggregate; 168 output cells.
    */
  def eventsHeatmap(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        expr("CAST(((dayofweek(ts) + 5) % 7) + 1 AS BIGINT)").as("iso_dow"),
        hour(col("ts")).cast("long").as("hour"))
      .agg(count(lit(1)).as("n"))

  def timeWeightedAvg(spark: SparkSession, dir: String): DataFrame =
    timeWeightedAvgOn(Tables.events(spark, dir))

  def timeWeightedAvgOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
    events
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("dus", lead("us", 1).over(w) - col("us"))
      .filter(col("dus").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_intervals"), sum("dus").as("span_us"),
        ((sum(col("cents") * col("dus")).cast("double") / sum("dus")) / lit(100.0)).as("twap"))
  }

  /** EWMA depth: weights 2⁷ … 2⁰ over the last 8 observations. */
  val EwmaDepth = 8

  /** Exponential smoothing with DYADIC weights — EWMA at α = 1/2 truncated
    * to the last [[EwmaDepth]] points, so the weighted sum
    * Σ cents(t−k)·2^(7−k) is EXACT 64-bit integer arithmetic (the float
    * EWMA recurrence accumulates engine-specific rounding; powers of two
    * don't). Emits numerator and denominator (Σ of the weights actually
    * present near series heads) separately: the one float division is the
    * consumer's, never crossing engines. Same windowed shape as any
    * `rowsBetween` running aggregate — one shuffle on user_id, O(depth)
    * work per row.
    */
  def ewmaDyadic(spark: SparkSession, dir: String): DataFrame =
    ewmaDyadicOn(Tables.events(spark, dir))

  def ewmaDyadicOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val base = events.select(col("event_id"), col("user_id"), col("ts"),
      round(col("value") * 100).cast("long").as("cents"))
    val num = (0 until EwmaDepth)
      .map(k => coalesce(lag(col("cents"), k).over(w), lit(0L)) * lit(1L << (EwmaDepth - 1 - k)))
      .reduce(_ + _)
    val den = (0 until EwmaDepth)
      .map(k => when(lag(col("cents"), k).over(w).isNotNull,
        lit(1L << (EwmaDepth - 1 - k))).otherwise(lit(0L)))
      .reduce(_ + _)
    base
      .withColumn("ewma_num", num)
      .withColumn("ewma_den", den)
      .select("event_id", "user_id", "ewma_num", "ewma_den")
  }

  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionizeOn(Tables.events(spark, dir))

  /** Core sessionization over any events-shaped frame (unit-testable). */
  def sessionizeOn(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val runFrame = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("event_id"), col("user_id"), col("ts"), tsd.as("epoch"))
      .withColumn("new_session",
        when(col("epoch") - lag("epoch", 1).over(byUser) > 1800d || lag("epoch", 1).over(byUser).isNull, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum("new_session").over(runFrame))
      .groupBy("user_id", "session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        floor(min("epoch")).cast("long").as("session_start_epoch"),
        floor(max("epoch") - min("epoch")).cast("long").as("duration_sec"))
  }

  /** As-of join — an operator Spark lacks natively, composed from built-ins
    * (SURVEY §2.2): for every purchase event, the user's most recent click
    * at-or-before it. Implemented with the union + `last(_, ignoreNulls)`
    * running-window trick: tag both streams, interleave per user in time
    * order (clicks before purchases on ties, matching ASOF's `>=`), and
    * carry the latest click forward. One shuffle on user_id, no join at
    * all — at 100 TB this beats a range-join candidate explosion outright.
    * Clicks are deduped to one per (user, instant) — max event_id — because
    * ASOF semantics are ill-defined under timestamp ties. Nulls (purchase
    * before any click) are coalesced to -1 for engine-portable output.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame =
    asofJoinOn(Tables.events(spark, dir))

  /** Core as-of transform over any events-shaped frame (unit-testable). */
  def asofJoinOn(events: DataFrame): DataFrame = {
    val ev = events
      .select(col("event_id"), col("user_id"), col("event_type"), tsd.as("ep"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ep").agg(max("event_id").as("click_id"))
      .select(col("user_id"), col("ep"), lit(0).as("kind"), col("click_id"),
        lit(null).cast("long").as("purchase_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ep"), lit(1).as("kind"),
        lit(null).cast("long").as("click_id"), col("event_id").as("purchase_id"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ep").asc, col("kind").asc, col("purchase_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("asof_click_id", last("click_id", ignoreNulls = true).over(w))
      .withColumn("asof_click_ep", last(when(col("kind") === 0, col("ep")), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(
        col("purchase_id"),
        col("user_id"),
        coalesce(col("asof_click_id"), lit(-1L)).as("click_id"),
        coalesce(floor(col("ep") - col("asof_click_ep")).cast("long"), lit(-1L)).as("gap_sec"))
  }

  /** Funnel analysis — view → click → purchase in strict temporal order
    * per user: each stage is "earliest qualifying event after the previous
    * stage's time". Three stage aggregates, each a groupBy(user) over a
    * type-filtered scan joined to the prior stage (filters push to the
    * scan; at 100 TB each stage is one selective scan + one user-keyed
    * shuffle — the standard distributed funnel; a single-pass
    * sessionized variant exists but trades clarity for one scan).
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), tsd.as("ep"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ep").as("v_ep"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ep") > col("v_ep"))
      .groupBy("user_id").agg(min("ep").as("c_ep"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ep") > col("c_ep"))
      .groupBy("user_id").agg(min("ep").as("p_ep"))
    v.agg(lit("1_view").as("stage"), count(lit(1)).as("n_users"))
      .unionByName(c.agg(lit("2_view_click").as("stage"), count(lit(1)).as("n_users")))
      .unionByName(p.agg(lit("3_view_click_purchase").as("stage"), count(lit(1)).as("n_users")))
  }

  /** Cohort retention: users grouped by first-activity week, counted per
    * weekly offset they remain active — two aggregates (cohort assignment,
    * distinct weekly activity) + one user-keyed join; both engines truncate
    * weeks to Monday in UTC, offsets are exact integer epoch arithmetic.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
    val cohort = ev.groupBy("user_id").agg(min("week").as("cohort_week"))
    val activity = ev.distinct()
    activity.join(cohort, "user_id")
      .groupBy(
        unix_timestamp(col("cohort_week")).as("cohort_epoch"),
        ((unix_timestamp(col("week")) - unix_timestamp(col("cohort_week"))) / 604800L)
          .cast("long").as("week_offset"))
      .agg(countDistinct("user_id").as("n_users"))
  }

  /** Bucketed range join — the scalable form of a time-proximity join: for
    * every purchase, how many clicks by the same user landed within ±10
    * minutes. A naive range join explodes candidates (every purchase ×
    * every click per user); instead clicks are assigned to every 20-minute
    * bucket their ±10-minute halo touches (≤ 2 rows each), the join is a
    * plain EQUI-join on (user, bucket) — shuffle-friendly, AQE-visible —
    * and the exact range predicate filters the short candidate list. At
    * 100 TB the bucket width tunes candidate size; the plan shape is
    * unchanged.
    */
  def rangeJoinBucketed(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), tsd.as("ep"))
    val width = 1200L // 2 × the ±600 s halo → a halo spans ≤ 2 buckets
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ep").as("pep"), floor(col("ep") / width).as("bucket"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ep").as("cep"))
      .withColumn("bucket", explode(array_distinct(array(
        floor((col("cep") - 600) / width), floor((col("cep") + 600) / width)))))
    purchases
      .join(clicks,
        col("user_id") === col("c_user") && purchases("bucket") === clicks("bucket")
          && abs(col("cep") - col("pep")) <= 600, "left")
      .groupBy("purchase_id", "user_id")
      .agg(count(col("click_id")).as("n_nearby_clicks"))
  }

  /** Exact interpolated percentiles per group (Spark `percentile` and
    * DuckDB `quantile_cont` share the linear-interpolation definition).
    *
    * FIXTURE-SCALE BASELINE: exact `percentile` buffers every value of the
    * group in the aggregation buffer — fine at test SFs, OOM at 100 TB.
    * The production path is [[percentilesApprox]] (fixed-memory KLL-style
    * sketch); this exact form exists as its verification anchor and is
    * marked accordingly in SCALING.md.
    */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"),
        count(lit(1)).as("n"))

  /** Scale-safe percentiles: the `approx_percentile` sketch (fixed memory
    * per group regardless of group size — the 100 TB path) gated by the
    * sketch-oracle pattern of `agg_approx_percentile`: the verified surface
    * is the exact interpolated median plus deterministic bound booleans
    * asserting each sketch estimate lands inside an exact rank band around
    * its target quantile. Accuracy 10000 ⇒ rank error ≤ 1e-4; the bands
    * (±0.02 / ±0.02 / ±0.005 rank) leave 50-200× safety margin, so the
    * booleans are deterministically true for any conforming sketch and
    * false for a broken one.
    */
  def percentilesApprox(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        expr("approx_percentile(value, array(0.5, 0.9, 0.99), 10000)").as("apx"),
        expr("percentile(value, array(0.48, 0.52, 0.88, 0.92, 0.985, 0.995))").as("bands"))
      .select(
        col("event_type"), col("p50"),
        (element_at(col("apx"), 1).between(
          element_at(col("bands"), 1), element_at(col("bands"), 2))).as("approx_p50_ok"),
        (element_at(col("apx"), 2).between(
          element_at(col("bands"), 3), element_at(col("bands"), 4))).as("approx_p90_ok"),
        (element_at(col("apx"), 3).between(
          element_at(col("bands"), 5), element_at(col("bands"), 6))).as("approx_p99_ok"))

  /** RANGE-framed window: per user, the running sum of `value` over the
    * trailing 30 minutes of EVENT TIME (not row count) — a range frame on
    * the epoch-seconds ordering column.
    */
  def windowRange(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ep"))
      .rangeBetween(-1800L, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"),
        floor(tsd).cast("long").as("ep"))
      .withColumn("trailing_30m_value", round(sum("value").over(w), 2))
      .select("event_id", "user_id", "trailing_30m_value")
  }

  /** min_by/max_by (arg-extrema) aggregates: per user, the event id that
    * carried the largest / smallest value.
    */
  def argExtrema(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      // one deterministic winner per (user, value): highest event_id
      .groupBy("user_id")
      .agg(
        expr("max_by(event_id, struct(value, event_id))").as("max_value_event"),
        expr("min_by(event_id, struct(value, event_id))").as("min_value_event"),
        round(max("value"), 2).as("max_value"),
        round(min("value"), 2).as("min_value"))

  /** Native `session_window` (30 min gap) in batch mode — the built-in
    * operator equivalent of [[sessionize]]'s manual gaps-and-islands
    * (session merges while the next event starts strictly inside
    * [ts, ts+gap); the oracle mirrors that `>= gap ⇒ new session` edge).
    */
  def sessionWindowNative(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(
        col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start_epoch"),
        col("n_events"), col("total_value"))

  /** DYNAMIC-gap `session_window`: the timeout is a per-event EXPRESSION
    * (purchases hold a session open 1 h, errors only 5 min, everything
    * else 30 min) — the engagement-dependent sessionization real
    * clickstream pipelines want and fixed-gap sessions can't express.
    * Semantically each event spans [ts, ts+gap) and overlapping spans
    * merge per user; the oracle replays that interval-union islanding
    * exactly (running max of span ends over the time-ordered prefix; a
    * new island starts when an event's ts clears every previous end —
    * correct for sorted starts even across islands). The gate covers
    * start AND merged end (= max span end), so the per-event gap
    * arithmetic is verified, not just the grouping. Same scale shape as
    * the fixed-gap native session: one shuffle on user_id, per-partition
    * sort-merge of spans, no windows over the full table.
    */
  def sessionWindowDynamic(spark: SparkSession, dir: String): DataFrame = {
    // string gaps: session_window casts them to CalendarInterval (the
    // documented dynamic-gap form; DayTime interval literals are rejected)
    val gap = when(col("event_type") === "purchase", "1 hour")
      .when(col("event_type") === "error", "5 minutes")
      .otherwise("30 minutes")
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(
        col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start_epoch"),
        unix_timestamp(col("session_window.end")).as("session_end_epoch"),
        col("n_events"), col("total_value"))
  }

  /** Fixed-width histogram of `value` (10 bins of 50 over the known
    * [0, 500) domain) — the one-pass distributed histogram primitive.
    */
  def valueHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(least(floor(col("value") / 50), lit(9)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("bucket_avg"))

  /** SCD TYPE-2 interval build — the temporal-table companion to
    * `merge_upsert`'s SCD-1: each user's event_type stream collapses into
    * validity intervals [valid_from, valid_to) with NULL marking the
    * current row. Change detection is lag-vs-current, interval identity a
    * running change-count (gaps-and-islands keyed on VALUE change, where
    * `sessionize` keys on time gaps), and valid_to the next interval's
    * start via lead — three window passes sharing ONE user_id partitioning
    * (a single shuffle). Epochs in exact microseconds; ties broken by
    * event_id, so the build is deterministic on both engines.
    */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val marked = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .withColumn("chg",
        when(col("prev_type").isNull || col("prev_type") =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("grp", sum("chg").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked.groupBy("user_id", "event_type", "grp")
      .agg(unix_micros(min(col("ts"))).as("valid_from_us"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to_us", lead("valid_from_us", 1).over(
        Window.partitionBy("user_id").orderBy("valid_from_us")))
      .select("user_id", "event_type", "valid_from_us", "valid_to_us", "n_events")
  }

  /** POINT-IN-TIME (temporal) join against the SCD2 dimension — the
    * "which version was current when this fact happened" lookup every
    * warehouse history table exists to answer, closing the
    * [[scd2Intervals]] end-to-end story: probe rows (the even-id events)
    * retrieve the version of their user's type-run dimension valid at the
    * probe timestamp. The implementation is deliberately NOT a range
    * join: versions and probes union onto one per-user timeline (version
    * boundaries sort before probes at equal ts — a probe AT a boundary
    * sees the new version, matching `valid_from <= p < valid_to`), and
    * one forward-fill window (`last(..., ignoreNulls)`) carries the
    * current version's attributes onto every probe. ONE shuffle on
    * user_id, no interval predicate anywhere — at 100 TB this is the
    * union-window PIT recipe that replaces the O(probes × versions)
    * theta join. The oracle is the INDEPENDENT declarative formulation
    * (interval-containment join on the lead-closed intervals), so the
    * gate proves the two shapes equivalent, boundary semantics included.
    */
  def scd2PitJoin(spark: SparkSession, dir: String): DataFrame = {
    val iv = scd2Intervals(spark, dir)
    val vrows = iv.select(col("user_id"), col("valid_from_us").as("t_us"),
      lit(0L).as("kind"), lit(null).cast("long").as("event_id"),
      col("event_type").as("vt"), col("valid_from_us").as("vf"),
      col("n_events").as("vn"), col("valid_to_us").as("vtend"))
    val prows = Tables.events(spark, dir)
      .filter(col("event_id") % 2 === 0)
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
        lit(1L).as("kind"), col("event_id"),
        lit(null).cast("string").as("vt"), lit(null).cast("long").as("vf"),
        lit(null).cast("long").as("vn"), lit(null).cast("long").as("vtend"))
    // tertiary key `vtend` (interval END, nulls last) makes the fill
    // deterministic when two versions share a valid_from_us (two
    // same-timestamp events with different types opening consecutive
    // runs): the earlier version's interval is the empty [t, t) — its
    // vtend = t sorts FIRST, so the later version (greater or open-ended
    // vtend) fills last among equal-t boundaries and wins, matching the
    // oracle's interval-containment join, which matches nothing to an
    // empty interval. vf alone could NOT break this tie (both versions
    // share it by construction).
    val w = Window.partitionBy("user_id")
      .orderBy(col("t_us"), col("kind"), col("vtend").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vrows.unionByName(prows)
      .withColumn("ver_type", last(col("vt"), ignoreNulls = true).over(w))
      .withColumn("ver_from_us", last(col("vf"), ignoreNulls = true).over(w))
      .withColumn("ver_n_events", last(col("vn"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("user_id"), col("event_id"), col("t_us").as("probe_us"),
        col("ver_type"), col("ver_from_us"), col("ver_n_events"))
  }

  /** Time-series GAP FILL: the dense hourly spine every downstream
    * forecasting/rate job assumes — per user, generate every hour between
    * first and last activity (`sequence` + `explode`, Spark's lateral
    * table-function shape), left-join the sparse per-hour aggregates, and
    * zero-fill the holes. Scale: the spine is ∝ users × active-range
    * (generated map-side from a 2-column bounds aggregate, never stored),
    * and both join sides share the (user_id, hr) key — one exchange each.
    */
  def eventsGapFill(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hr"), col("value"))
    val perHour = e.groupBy("user_id", "hr")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
    val spine = e.groupBy("user_id")
      .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
      .select(col("user_id"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("hr"))
    spine.join(perHour, Seq("user_id", "hr"), "left")
      .select(col("user_id"), unix_timestamp(col("hr")).as("hour_epoch"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("total_value"), lit(0.0)).as("total_value"))
  }

  /** LINEAR INTERPOLATION onto an hourly grid — the resampling primitive
    * that turns an irregular event stream into the fixed-step series every
    * downstream forecast/feature job wants ([[eventsGapFill]] zero-fills
    * aggregates; this reconstructs the VALUE between observations). Grid
    * points and events union into one per-user timeline; two mirrored
    * running windows find the nearest observation on each side (`last`
    * IGNORE NULLS ascending = predecessor, the same over the reversed
    * order = successor), then v = v0 + (v1−v0)·(t−t0)/(t1−t0) in exact
    * microseconds. ONE shuffle on user_id feeds both window passes and
    * the sort is shared. A grid point coinciding with an event emits that
    * event's value via the t0 = t branch (the successor window excludes
    * same-timestamp events by construction — ordering makes that case
    * exact rather than special-cased). Edges without both neighbors drop
    * under the same rule the oracle states.
    */
  def eventsInterpolate(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
    val spine = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(col("user_id"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("hts"))
      .select(col("user_id"), unix_micros(col("hts")).as("ts_us"),
        lit(1).as("is_grid"), lit(null).cast("double").as("value"))
    val unioned = e.select(col("user_id"), col("ts_us"), lit(0).as("is_grid"), col("value"))
      .unionByName(spine)
    val wAsc = Window.partitionBy("user_id")
      .orderBy(col("ts_us").asc, col("is_grid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy("user_id")
      .orderBy(col("ts_us").desc, col("is_grid").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ev = when(col("is_grid") === 0, col("value"))
    val et = when(col("is_grid") === 0, col("ts_us"))
    unioned
      .withColumn("v0", last(ev, ignoreNulls = true).over(wAsc))
      .withColumn("t0", last(et, ignoreNulls = true).over(wAsc))
      .withColumn("v1", last(ev, ignoreNulls = true).over(wDesc))
      .withColumn("t1", last(et, ignoreNulls = true).over(wDesc))
      .filter(col("is_grid") === 1 && col("v0").isNotNull &&
        (col("v1").isNotNull || col("t0") === col("ts_us")))
      .select(
        col("user_id"),
        expr("ts_us div 1000000").as("grid_epoch"),
        round(
          when(col("t0") === col("ts_us") || col("t1") === col("t0"), col("v0"))
            .otherwise(col("v0") + (col("v1") - col("v0")) *
              (col("ts_us") - col("t0")) / (col("t1") - col("t0"))), 4).as("v_interp"))
  }

  /** Per-user z-score anomaly counts — the monitoring primitive (flag
    * events > 2σ from the user's mean). The 2σ test is rearranged into
    * EXACT INTEGER arithmetic over cents: `(n·v − s)²·(n−1) > 4·n·(n·ss − s²)`
    * with s = Σv, ss = Σv² — algebraically identical to |v − μ| > 2σ but
    * free of the cross-engine float hazards of avg/stddev (whose one-pass
    * accumulation is summation-order-dependent). Values are exact 2dp, so
    * cents are lossless; magnitudes stay < 2⁶³ through sf0.1 (at larger n
    * the same identity runs in decimal). One shuffle for the stats, one
    * joined pass for the test — both on user_id, so AQE plans the second
    * as a broadcast or co-partitioned join.
    */
  def eventsAnomaly(spark: SparkSession, dir: String): DataFrame =
    eventsAnomalyOn(Tables.events(spark, dir))

  def eventsAnomalyOn(events: DataFrame): DataFrame = {
    val c = events
      .select(col("user_id"), round(col("value") * 100).cast("long").as("v"))
    val st = c.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("v").as("s"), sum(col("v") * col("v")).as("ss"))
      .filter(col("n") >= 5)
    val dev = col("n") * col("v") - col("s")
    c.join(st, "user_id")
      .groupBy("user_id")
      .agg(max(col("n")).as("n_events"),
        sum(when(dev * dev * (col("n") - 1) > lit(4) * col("n") * (col("n") * col("ss") - col("s") * col("s")), 1L)
          .otherwise(0L)).as("n_anomalies"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_anomaly" -> eventsAnomaly _,
    "events_gap_fill" -> eventsGapFill _,
    "events_interpolate" -> eventsInterpolate _,
    "scd2_intervals" -> scd2Intervals _,
    "scd2_pit_join" -> scd2PitJoin _,
    "value_histogram" -> valueHistogram _,
    "session_window_native" -> sessionWindowNative _,
    "session_window_dynamic" -> sessionWindowDynamic _,
    "asof_join" -> asofJoin _,
    "join_range_bucketed" -> rangeJoinBucketed _,
    "agg_percentiles" -> percentiles _,
    "agg_percentiles_approx" -> percentilesApprox _,
    "window_range" -> windowRange _,
    "agg_argmax" -> argExtrema _,
    "events_tumbling" -> tumbling _,
    "events_sliding" -> sliding _,
    "sliding_distinct_users" -> slidingDistinctUsers _,
    "events_funnel" -> funnel _,
    "cohort_retention" -> cohortRetention _,
    "window_rank" -> windowRank _,
    "window_running" -> windowRunning _,
    "window_lag" -> windowLag _,
    "sessionize" -> sessionize _,
    "time_weighted_avg" -> timeWeightedAvg _,
    "ewma_dyadic" -> ewmaDyadic _,
    "gap_histogram" -> gapHistogram _,
    "markov_transitions" -> markovTransitions _,
    "feature_scaling" -> featureScaling _,
    "rank_normalize" -> rankNormalize _,
    "events_heatmap" -> eventsHeatmap _,
  )

  /** DuckDB reads `events.ts` as TIMESTAMP_NS; `ts::TIMESTAMP` truncates to
    * µs — bit-identical to what [[graft.sources.Tables.events]] gives Spark.
    */
  /** Dialect mirror of [[ewmaDyadicOn]]'s unrolled dyadic window sum. */
  private lazy val ewmaDyadicOracleSql: String = {
    val terms = (0 until EwmaDepth)
      .map(k => s"coalesce(lag(cents, $k) OVER w, 0) * ${1L << (EwmaDepth - 1 - k)}")
      .mkString(" + ")
    val dens = (0 until EwmaDepth)
      .map(k => s"CASE WHEN lag(cents, $k) OVER w IS NOT NULL THEN ${1L << (EwmaDepth - 1 - k)} ELSE 0 END")
      .mkString(" + ")
    s"""WITH c AS (
       |  SELECT event_id, user_id, ts::TIMESTAMP AS t,
       |         round(value * 100)::BIGINT AS cents
       |  FROM events)
       |SELECT event_id, user_id,
       | ($terms)::BIGINT AS ewma_num,
       | ($dens)::BIGINT AS ewma_den
       |FROM c WINDOW w AS (PARTITION BY user_id ORDER BY t ASC, event_id ASC)""".stripMargin
  }

  def oracle: Map[String, String] = Map(
    "ewma_dyadic" -> ewmaDyadicOracleSql,
    "markov_transitions" ->
      """WITH s AS (
        |  SELECT user_id, ts::TIMESTAMP AS t, event_id, event_type AS cur
        |  FROM events),
        |p AS (
        |  SELECT cur,
        |   lead(cur) OVER (PARTITION BY user_id ORDER BY t ASC, event_id ASC) AS nxt
        |  FROM s),
        |c AS (
        |  SELECT cur, nxt, count(*)::BIGINT AS n FROM p
        |  WHERE nxt IS NOT NULL GROUP BY 1, 2)
        |SELECT cur, nxt, n,
        | round(n / sum(n) OVER (PARTITION BY cur), 4) AS p
        |FROM c""".stripMargin,
    "scd2_intervals" ->
      """WITH o AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type,
        |   CASE WHEN lag(event_type) OVER w IS NULL
        |         OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)),
        |g AS (
        |  SELECT user_id, ts, event_id, event_type,
        |   sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM o),
        |iv AS (
        |  SELECT user_id, event_type, grp,
        |   epoch_us(min(ts))::BIGINT AS valid_from_us, count(*)::BIGINT AS n_events
        |  FROM g GROUP BY 1, 2, 3)
        |SELECT user_id, event_type, valid_from_us,
        | lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY valid_from_us) AS valid_to_us,
        | n_events
        |FROM iv""".stripMargin,
    // the INDEPENDENT declarative formulation of the union-window PIT
    // join: interval containment on the lead-closed SCD2 table (the Spark
    // side never states an interval predicate — their agreement is the
    // point of the gate)
    "scd2_pit_join" ->
      """WITH o AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type,
        |   CASE WHEN lag(event_type) OVER w IS NULL
        |         OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)),
        |g AS (
        |  SELECT user_id, ts, event_id, event_type,
        |   sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM o),
        |iv AS (
        |  SELECT user_id, event_type, grp,
        |   epoch_us(min(ts))::BIGINT AS valid_from_us, count(*)::BIGINT AS n_events
        |  FROM g GROUP BY 1, 2, 3),
        |scd AS (
        |  SELECT user_id, event_type, valid_from_us,
        |   lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY valid_from_us) AS valid_to_us,
        |   n_events
        |  FROM iv),
        |probes AS (
        |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP)::BIGINT AS probe_us
        |  FROM events WHERE event_id % 2 = 0)
        |SELECT p.user_id, p.event_id, p.probe_us,
        | v.event_type AS ver_type, v.valid_from_us AS ver_from_us,
        | v.n_events AS ver_n_events
        |FROM probes p JOIN scd v
        |  ON p.user_id = v.user_id
        | AND v.valid_from_us <= p.probe_us
        | AND (p.probe_us < v.valid_to_us OR v.valid_to_us IS NULL)""".stripMargin,
    "events_gap_fill" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('hour', ts::TIMESTAMP) AS hr, value FROM events),
        |ph AS (
        |  SELECT user_id, hr, count(*)::BIGINT AS n_events,
        |   round(sum(value), 2) AS total_value
        |  FROM e GROUP BY 1, 2),
        |spine AS (
        |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
        |  FROM (SELECT user_id, min(hr) AS h0, max(hr) AS h1 FROM e GROUP BY 1))
        |SELECT s.user_id, floor(epoch(s.hr))::BIGINT AS hour_epoch,
        | coalesce(ph.n_events, 0)::BIGINT AS n_events,
        | coalesce(ph.total_value, 0) AS total_value
        |FROM spine s LEFT JOIN ph ON s.user_id = ph.user_id AND s.hr = ph.hr""".stripMargin,
    "events_anomaly" ->
      """WITH c AS (
        |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |st AS (
        |  SELECT user_id, count(*) AS n, sum(v)::BIGINT AS s, sum(v * v)::BIGINT AS ss
        |  FROM c GROUP BY 1 HAVING count(*) >= 5)
        |SELECT c.user_id, max(n)::BIGINT AS n_events,
        | sum(CASE WHEN (n*v - s)*(n*v - s)*(n - 1) > 4*n*(n*ss - s*s)
        |          THEN 1 ELSE 0 END)::BIGINT AS n_anomalies
        |FROM c JOIN st ON c.user_id = st.user_id
        |GROUP BY c.user_id""".stripMargin,
    "value_histogram" ->
      """SELECT least(floor(value / 50), 9)::BIGINT AS bucket,
        | count(*) AS n, round(avg(value), 4) AS bucket_avg
        |FROM events GROUP BY 1""".stripMargin,
    "session_window_native" ->
      """WITH marked AS (
        |  SELECT user_id, value, epoch(ts::TIMESTAMP) AS ep, event_id,
        |   CASE WHEN lag(epoch(ts::TIMESTAMP), 1) OVER w IS NULL
        |         OR epoch(ts::TIMESTAMP) - lag(epoch(ts::TIMESTAMP), 1) OVER w >= 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP ASC, event_id ASC)
        |), sess AS (
        |  SELECT user_id, value, ep,
        |   (sum(new_session) OVER (PARTITION BY user_id ORDER BY ep ASC, event_id ASC
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_seq
        |  FROM marked)
        |SELECT user_id, floor(min(ep))::BIGINT AS session_start_epoch,
        | count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM sess GROUP BY user_id, session_seq""".stripMargin,
    // interval-union islanding with a per-event gap: an event opens a new
    // session iff its start clears the running max of all previous span
    // ends (exact for spans sorted by start); end = merged max span end
    "session_window_dynamic" ->
      """WITH g AS (
        |  SELECT user_id, value, event_id, epoch(ts::TIMESTAMP) AS ep,
        |   CASE event_type WHEN 'purchase' THEN 3600 WHEN 'error' THEN 300
        |        ELSE 1800 END AS gap
        |  FROM events
        |), marked AS (
        |  SELECT user_id, value, ep, gap, event_id,
        |   max(ep + gap) OVER (PARTITION BY user_id ORDER BY ep ASC, event_id ASC
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_end
        |  FROM g
        |), isl AS (
        |  SELECT user_id, value, ep, gap,
        |   (sum(CASE WHEN prev_max_end IS NULL OR ep >= prev_max_end THEN 1 ELSE 0 END)
        |     OVER (PARTITION BY user_id ORDER BY ep ASC, event_id ASC
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_seq
        |  FROM marked
        |)
        |SELECT user_id, floor(min(ep))::BIGINT AS session_start_epoch,
        | floor(max(ep + gap))::BIGINT AS session_end_epoch,
        | count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM isl GROUP BY user_id, session_seq""".stripMargin,
    // identical union + mirrored-window construction; same edge rule
    "events_interpolate" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts::TIMESTAMP) AS ts_us, value FROM events
        |), b AS (
        |  SELECT user_id, min(ts::TIMESTAMP) AS mn, max(ts::TIMESTAMP) AS mx
        |  FROM events GROUP BY 1
        |), spine AS (
        |  SELECT user_id,
        |   unnest(generate_series(date_trunc('hour', mn), date_trunc('hour', mx),
        |     INTERVAL 1 HOUR)) AS hts
        |  FROM b
        |), u AS (
        |  SELECT user_id, ts_us, 0 AS is_grid, value FROM e
        |  UNION ALL
        |  SELECT user_id, epoch_us(hts), 1, NULL::DOUBLE FROM spine
        |), n AS (
        |  SELECT user_id, ts_us, is_grid,
        |   last_value(CASE WHEN is_grid = 0 THEN value END IGNORE NULLS) OVER wa AS v0,
        |   last_value(CASE WHEN is_grid = 0 THEN ts_us END IGNORE NULLS) OVER wa AS t0,
        |   last_value(CASE WHEN is_grid = 0 THEN value END IGNORE NULLS) OVER wd AS v1,
        |   last_value(CASE WHEN is_grid = 0 THEN ts_us END IGNORE NULLS) OVER wd AS t1
        |  FROM u
        |  WINDOW wa AS (PARTITION BY user_id ORDER BY ts_us ASC, is_grid ASC
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wd AS (PARTITION BY user_id ORDER BY ts_us DESC, is_grid DESC
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT user_id, ts_us // 1000000 AS grid_epoch,
        | round(CASE WHEN t0 = ts_us OR t1 = t0 THEN v0
        |       ELSE v0 + (v1 - v0) * (ts_us - t0) / (t1 - t0) END, 4) AS v_interp
        |FROM n
        |WHERE is_grid = 1 AND v0 IS NOT NULL AND (v1 IS NOT NULL OR t0 = ts_us)""".stripMargin,
    "asof_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, epoch(ts::TIMESTAMP) AS ep FROM events),
        |clicks AS (
        |  SELECT user_id, ep, max(event_id) AS click_id
        |  FROM ev WHERE event_type = 'click' GROUP BY user_id, ep),
        |purchases AS (
        |  SELECT event_id AS purchase_id, user_id, ep
        |  FROM ev WHERE event_type = 'purchase')
        |SELECT p.purchase_id, p.user_id,
        | coalesce(c.click_id, -1) AS click_id,
        | coalesce(floor(p.ep - c.ep)::BIGINT, -1) AS gap_sec
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ep >= c.ep""".stripMargin,
    "join_range_bucketed" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        | (SELECT count(*) FROM events c
        |  WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |    AND abs(epoch(c.ts::TIMESTAMP) - epoch(p.ts::TIMESTAMP)) <= 600) AS n_nearby_clicks
        |FROM events p WHERE p.event_type = 'purchase'""".stripMargin,
    "agg_percentiles_approx" ->
      """SELECT event_type,
        | round(quantile_cont(value, 0.5), 4) AS p50,
        | true AS approx_p50_ok, true AS approx_p90_ok, true AS approx_p99_ok
        |FROM events GROUP BY event_type""".stripMargin,
    "agg_percentiles" ->
      """SELECT event_type,
        | round(quantile_cont(value, 0.5), 4) AS p50,
        | round(quantile_cont(value, 0.9), 4) AS p90,
        | round(quantile_cont(value, 0.99), 4) AS p99,
        | count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,
    "window_range" ->
      """SELECT event_id, user_id,
        | round(sum(value) OVER (PARTITION BY user_id ORDER BY floor(epoch(ts::TIMESTAMP))::BIGINT
        |   RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW), 2) AS trailing_30m_value
        |FROM events""".stripMargin,
    "agg_argmax" ->
      """WITH ranked AS (
        |  SELECT user_id, event_id, value,
        |   row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id DESC) AS rmax,
        |   row_number() OVER (PARTITION BY user_id ORDER BY value ASC, event_id ASC) AS rmin
        |  FROM events),
        |agg AS (
        |  SELECT user_id, round(max(value), 2) AS max_value, round(min(value), 2) AS min_value
        |  FROM events GROUP BY user_id)
        |SELECT a.user_id, mx.event_id AS max_value_event, mn.event_id AS min_value_event,
        | a.max_value, a.min_value
        |FROM agg a
        |JOIN ranked mx ON mx.user_id = a.user_id AND mx.rmax = 1
        |JOIN ranked mn ON mn.user_id = a.user_id AND mn.rmin = 1""".stripMargin,
    "events_tumbling" ->
      """SELECT floor(epoch(date_trunc('hour', ts::TIMESTAMP)))::BIGINT AS hour_epoch, event_type,
        | count(*) AS n_events, round(sum(value),2) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "sliding_distinct_users" ->
      """WITH ev AS (
        |  SELECT user_id, floor(epoch(ts::TIMESTAMP) / 1800)::BIGINT AS slot FROM events),
        |wins AS (
        |  SELECT user_id, (slot - 1) * 1800 AS win_epoch FROM ev
        |  UNION ALL
        |  SELECT user_id, slot * 1800 FROM ev)
        |SELECT win_epoch, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM wins GROUP BY 1""".stripMargin,
    "events_sliding" ->
      """WITH ev AS (
        |  SELECT event_type, value,
        |   floor(epoch(ts::TIMESTAMP) / 1800)::BIGINT AS slot
        |  FROM events),
        |wins AS (
        |  SELECT event_type, value, (slot - 1) * 1800 AS win_epoch FROM ev
        |  UNION ALL
        |  SELECT event_type, value, slot * 1800 FROM ev)
        |SELECT win_epoch, event_type, count(*) AS n_events,
        | round(sum(value), 2) AS total_value
        |FROM wins GROUP BY 1, 2""".stripMargin,
    "cohort_retention" ->
      """WITH ev AS (SELECT DISTINCT user_id, date_trunc('week', ts::TIMESTAMP) AS week FROM events),
        |cohort AS (SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id)
        |SELECT floor(epoch(cohort_week))::BIGINT AS cohort_epoch,
        | ((floor(epoch(week)) - floor(epoch(cohort_week))) / 604800)::BIGINT AS week_offset,
        | count(DISTINCT e.user_id) AS n_users
        |FROM ev e JOIN cohort c ON e.user_id = c.user_id
        |GROUP BY 1, 2""".stripMargin,
    "events_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch(ts::TIMESTAMP) AS ep FROM events),
        |v AS (SELECT user_id, min(ep) AS v_ep FROM ev WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ep) AS c_ep FROM ev e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ep > v.v_ep GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ep) AS p_ep FROM ev e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ep > c.c_ep GROUP BY e.user_id)
        |SELECT '1_view' AS stage, count(*) AS n_users FROM v
        |UNION ALL SELECT '2_view_click', count(*) FROM c
        |UNION ALL SELECT '3_view_click_purchase', count(*) FROM p""".stripMargin,
    "window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |   row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "window_running" ->
      """SELECT event_id, user_id,
        | round(sum(value) OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP ASC, event_id ASC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
        |FROM events""".stripMargin,
    "window_lag" ->
      """SELECT event_id, user_id,
        | round(value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP ASC, event_id ASC), 2) AS delta
        |FROM events""".stripMargin,
    "rank_normalize" ->
      """SELECT event_id, event_type, value,
        | percent_rank() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS pct_rank
        |FROM events""".stripMargin,
    "events_heatmap" ->
      """SELECT ((dayofweek(ts::TIMESTAMP) + 6) % 7 + 1)::BIGINT AS iso_dow,
        | extract(hour FROM ts::TIMESTAMP)::BIGINT AS hour, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,
    "feature_scaling" ->
      """WITH c AS (
        |  SELECT event_id, event_type, round(value * 100)::BIGINT AS v FROM events),
        |st AS (
        |  SELECT event_type, count(*) AS n, sum(v)::BIGINT AS s,
        |   sum(v * v)::BIGINT AS ss, min(v) AS mn, max(v) AS mx
        |  FROM c GROUP BY 1)
        |SELECT event_id, c.event_type,
        | (n * v - s)::DOUBLE / (n * sqrt((n * ss - s * s)::DOUBLE / (n * (n - 1)))) AS zscore,
        | CASE WHEN mx > mn THEN (v - mn)::DOUBLE / (mx - mn) END AS minmax
        |FROM c JOIN st ON c.event_type = st.event_type""".stripMargin,
    "gap_histogram" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS us FROM events),
        |g AS (
        |  SELECT (us - lag(us, 1) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC)) // 1000000 AS gap_s
        |  FROM e)
        |SELECT length(gap_s::VARCHAR)::BIGINT AS decade, count(*) AS n,
        | min(gap_s) AS min_gap_s, max(gap_s) AS max_gap_s
        |FROM g WHERE gap_s IS NOT NULL GROUP BY 1""".stripMargin,
    "time_weighted_avg" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) AS us,
        |   round(value * 100)::BIGINT AS cents
        |  FROM events),
        |d AS (
        |  SELECT user_id, cents,
        |   lead(us, 1) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC) - us AS dus
        |  FROM e)
        |SELECT user_id, count(*) AS n_intervals, sum(dus)::BIGINT AS span_us,
        | (sum(cents * dus)::DOUBLE / sum(dus)) / 100.0 AS twap
        |FROM d WHERE dus IS NOT NULL GROUP BY user_id""".stripMargin,
    "sessionize" ->
      """WITH marked AS (
        |  SELECT event_id, user_id, epoch(ts::TIMESTAMP) AS ep,
        |   CASE WHEN lag(epoch(ts::TIMESTAMP), 1) OVER w IS NULL
        |         OR epoch(ts::TIMESTAMP) - lag(epoch(ts::TIMESTAMP), 1) OVER w > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP ASC, event_id ASC)
        |), sess AS (
        |  SELECT user_id, ep, event_id,
        |   (sum(new_session) OVER (PARTITION BY user_id ORDER BY ep ASC, event_id ASC
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_seq
        |  FROM marked)
        |SELECT user_id, session_seq, count(*) AS n_events,
        | floor(min(ep))::BIGINT AS session_start_epoch,
        | floor(max(ep) - min(ep))::BIGINT AS duration_sec
        |FROM sess GROUP BY user_id, session_seq""".stripMargin,
  )
}
