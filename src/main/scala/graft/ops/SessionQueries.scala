package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table: gap-based
  * sessionization (the batch twin of the streaming state machine in
  * graft.streaming) and conditional event-type aggregation.
  *
  * `ts` is read as nanos-since-epoch BIGINT (Tables.events); all temporal
  * arithmetic is integer millisecond math both engines share exactly.
  */
object SessionQueries {
  import Tables._

  val GapMs: Long = 4 * 3600 * 1000L

  /** Gap sessionization: lag + cumulative-sum of session starts — the
    * classic two-window formulation; shuffles once on user_id and both
    * windows reuse that partitioning. */
  /** Ordered-sequence funnel (ClickHouse `windowFunnel` semantics — the
    * product-analytics kernel this surface lacked next to retention/
    * attribution): per user, the deepest prefix of the step sequence
    * signup → view → click → purchase completed by a STRICTLY ordered
    * event chain e₁ < e₂ < … < e_k with t_k − t₁ ≤ W. The report is the
    * classic funnel table: one row per step with the number of users
    * reaching at least that depth (monotone by construction — a valid
    * depth-k chain's prefixes are valid at every shallower depth, since
    * t_j ≤ t_k keeps the window).
    *
    * The device that makes this ONE window pass instead of a per-user
    * automaton: for the end-to-start window test, the BEST chain
    * reaching step j strictly before row r is the one with the MAXIMUM
    * start time — so three stacked running-max window columns (latest
    * signup before r; best signup-start among completed signup→view
    * chains before r; same through click) carry everything needed, and
    * each step's test is `ts − chain_start ≤ W` at its own event rows.
    * No intermediate window pruning is needed or correct: a larger
    * start is never worse, and prefix windows are implied by the final
    * one.
    *
    * Scale shape: ONE exchange + sort on (user_id, (tms, event_id)) —
    * the three Window nodes stack on the same spec, so Spark sorts once
    * and the later passes consume the order; the per-user rollup reuses
    * the partitioning; output is 4 rows. State per window is one BIGINT
    * per frame — no collect_list automaton, no per-user memory
    * proportional to history. Strictness comes from the ROWS
    * (unboundedPreceding, -1) frame over the (tms, event_id) total
    * order, which both engines replay identically. */
  def windowFunnel(spark: SparkSession, dir: String,
                   windowHours: Int = 72): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("tms"), col("event_id"))
    val before = byUser.rowsBetween(Window.unboundedPreceding, -1)
    val wMs = windowHours.toLong * 3600000L
    val chained = events(spark, dir)
      .select(col("user_id"), col("event_id"),
        expr("ts DIV 1000000L").as("tms"), col("event_type"))
      .withColumn("s1",
        max(when(col("event_type") === "signup", col("tms"))).over(before))
      .withColumn("c2",
        max(when(col("event_type") === "view", col("s1"))).over(before))
      .withColumn("c3",
        max(when(col("event_type") === "click", col("c2"))).over(before))
    val perUser = chained.groupBy(col("user_id")).agg(
      max(when(col("event_type") === "signup", 1L)).as("d1"),
      max(when(col("event_type") === "view" &&
        col("tms") - col("s1") <= wMs, 1L)).as("d2"),
      max(when(col("event_type") === "click" &&
        col("tms") - col("c2") <= wMs, 1L)).as("d3"),
      max(when(col("event_type") === "purchase" &&
        col("tms") - col("c3") <= wMs, 1L)).as("d4"))
    perUser.agg(
        coalesce(sum(col("d1")), lit(0L)).as("u1"),
        coalesce(sum(col("d2")), lit(0L)).as("u2"),
        coalesce(sum(col("d3")), lit(0L)).as("u3"),
        coalesce(sum(col("d4")), lit(0L)).as("u4"))
      .select(explode(array(
        struct(lit(1).as("step"), lit("signup").as("step_type"), col("u1").as("n_users")),
        struct(lit(2).as("step"), lit("view").as("step_type"), col("u2").as("n_users")),
        struct(lit(3).as("step"), lit("click").as("step_type"), col("u3").as("n_users")),
        struct(lit(4).as("step"), lit("purchase").as("step_type"), col("u4").as("n_users")))).as("r"))
      .select(col("r.step"), col("r.step_type"), col("r.n_users"))
      .orderBy(col("step"))
  }

  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("tms"), col("event_id"))
    val runner = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(spark, dir)
      // integer DIV, not `/`: epoch-nanos exceed 2^53, double division
      // would lose the low milliseconds
      .withColumn("tms", expr("ts DIV 1000000L"))
      .withColumn("prev", lag(col("tms"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev").isNull || col("tms") - col("prev") > GapMs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(runner))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("tms")) - min(col("tms"))).as("duration_ms"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** The same gap sessionization through Spark's NATIVE `session_window`
    * aggregation (the TimeWindow-family operator; the engine merges
    * overlapping per-row [t, t+gap) protosessions during the aggregate)
    * — same answer as the two-window island method in [[sessionize]],
    * different physical operator: one shuffle on (user, merged window),
    * no window functions at all. The island-method SQL is the oracle, so
    * the two formulations check each other.
    *
    * Scale shape: session_window aggregates with map-side partial merge
    * of protosessions — strictly cheaper than the sort-based island
    * windows when sessions are short; the 100 TB default. */
  def sessionWindowAgg(spark: SparkSession, dir: String): DataFrame = {
    events(spark, dir)
      .withColumn("tts", timestamp_micros(expr("ts DIV 1000")))
      .groupBy(col("user_id"),
        session_window(col("tts"), s"${GapMs / 1000} seconds").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("user_id"), unix_millis(col("sw.start")).as("start_ms"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("start_ms"))
  }

  /** RANGE-frame window: trailing-hour sum per user — the value-based
    * frame (peers by ORDER BY value distance, not row offsets) that
    * complements the ROWS frame in windowRunning. */
  def windowRange(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tms"))
      .rangeBetween(-3600000L, 0L)
    events(spark, dir)
      .filter(col("user_id") < 4)
      .withColumn("tms", expr("ts DIV 1000000L"))
      .withColumn("hour_sum",
        sum(col("value").cast("decimal(18,6)")).over(w).cast("double"))
      .select(col("user_id"), col("event_id"), col("hour_sum"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Sliding-window aggregation with Spark's native `window()` (2 h
    * windows sliding by 1 h): every event lands in exactly two windows —
    * the TimeWindow expression explodes window membership per row, so
    * the shuffle key is (window, event_type) and the aggregate is a
    * plain partial+final count, linear in |events| · (size/slide). The
    * batch complement of the streaming tumbling window (q_stream_window)
    * and the RANGE frame (q_window_range). */
  def slidingWindow(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      // ns → µs integer DIV (epoch-nanos exceed 2^53; see sessionize)
      .withColumn("tsx", timestamp_micros(expr("ts DIV 1000")))
      .groupBy(window(col("tsx"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("window.start")).as("w_start_ms"),
        col("event_type"), col("n"))
      .orderBy(col("w_start_ms"), col("event_type"))

  /** Equi-width histogram of the event value: bin edges from a 1-row
    * bounds probe (the reference's own pattern), bucket assignment a pure
    * per-row projection (floor over identical doubles — deterministic in
    * both engines, unlike round), then a |bins|-group aggregate with
    * map-side partials. The profiling/binning pass every numeric feature
    * column gets before training. */
  def histogram(spark: SparkSession, dir: String, nbins: Int = 20): DataFrame = {
    // NULL measures carry no bin: without the filter they'd floor to null
    // and least(null, max) would silently count them into the top bucket
    val ev = events(spark, dir).select(col("value"))
      .filter(col("value").isNotNull)
    val b = ev.agg(min(col("value")), max(col("value"))).head()
    if (b.isNullAt(0)) // empty (or all-NULL) input: empty histogram, right schema
      return ev.limit(0).select(lit(0).as("bucket"), lit(0L).as("n"),
        lit(0.0).as("sum_value"))
    val (lo, hi) = (b.getDouble(0), b.getDouble(1))
    val w = if (hi == lo) 1.0 else (hi - lo) / nbins
    ev.withColumn("bucket",
        least(floor((col("value") - lit(lo)) / lit(w)), lit((nbins - 1).toDouble)).cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .orderBy(col("bucket"))
  }

  /** Conditional (pivot-style) per-user aggregation by event type. */
  def eventTypeAgg(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        count(when(col("event_type") === "click", 1)).as("n_click"),
        count(when(col("event_type") === "view", 1)).as("n_view"),
        count(when(col("event_type") === "error", 1)).as("n_error"),
        sum(when(col("event_type") === "click", col("value").cast("decimal(18,6)")))
          .cast("double").as("click_value"))
      .orderBy(col("user_id"))

  /** SCD2 history build — collapse an event stream into
    * slowly-changing-dimension type-2 intervals: per user, consecutive
    * runs of the same event_type become one versioned row with
    * `[valid_from, valid_to)` millisecond bounds, the last interval open
    * (`valid_to` NULL) — the change-data-capture shape every warehouse
    * dimension load runs. Change detection is lag(), interval numbering
    * is the same running-sum trick as [[sessionize]], and valid_to is the
    * next interval's valid_from via lead().
    *
    * Scale shape: ONE shuffle on user_id; the change-detection window,
    * the running sum, and the final lead() all reuse that partitioning
    * (the lead runs over the already-aggregated interval relation, which
    * is strictly smaller). Ties break on event_id, so the history is
    * deterministic under concurrent same-millisecond events. */
  def scd2(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("tms"), col("event_id"))
    val runner = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bySeg = Window.partitionBy(col("user_id")).orderBy(col("version"))
    events(spark, dir)
      .withColumn("tms", expr("ts DIV 1000000L"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .withColumn("chg",
        when(col("prev_type").isNull || col("prev_type") =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("chg")).over(runner))
      .groupBy(col("user_id"), col("version"))
      .agg(
        // event_type is constant within a segment by construction
        min(col("event_type")).as("state"),
        min(col("tms")).as("valid_from_ms"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to_ms", lead(col("valid_from_ms"), 1).over(bySeg))
      .select(col("user_id"), col("version"), col("state"),
        col("valid_from_ms"), col("valid_to_ms"), col("n_events"))
      .orderBy(col("user_id"), col("version"))
  }

  /** Funnel analysis — the ordered-event conversion measure: of the users
    * whose stream contains a `view`, how many performed a `click` within
    * one hour AFTER their first view. Reported per user-id bucket so the
    * funnel segments like a real dashboard.
    *
    * Scale shape: the first-view relation is one filtered aggregate
    * (map-side partials); conversion is a hash equi join of the click
    * stream against it on user_id followed by the time-window predicate —
    * no self-join of the full event table, no window sort. All time math
    * is integer ms. */
  def funnel(spark: SparkSession, dir: String, windowMs: Long = 3600000L): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), col("event_type"), expr("ts DIV 1000000L").as("tms"))
    val firstView = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tms")).as("v"))
    val converted = ev.filter(col("event_type") === "click")
      .join(firstView, "user_id")
      .filter(col("tms") > col("v") && col("tms") <= col("v") + windowMs)
      .select(col("user_id")).distinct()
      .withColumn("converted", lit(1L))
    firstView.join(converted, Seq("user_id"), "left")
      .groupBy(pmod(col("user_id"), lit(10L)).as("bucket"))
      .agg(count(lit(1)).as("n_viewers"),
        sum(coalesce(col("converted"), lit(0L))).as("n_converted"))
      .orderBy(col("bucket"))
  }

  /** LOCF resampling — regularize an irregular event series onto an
    * hourly grid with last-observation-carried-forward (the gap-fill
    * every feature-engineering pipeline runs before a model sees time
    * series). Per user: sample each hour (order-free MAX of the hour's
    * integer-micro values — deterministic without a tie rule), densify to
    * the user's [first, last] hour via an integer `sequence` explode,
    * then carry the last non-null sample forward with an
    * ignoreNulls last() window.
    *
    * Scale shape: one (user, hour) aggregate with partials, one per-user
    * bounds aggregate, the grid explode (bounded by span/step), and a
    * user-partitioned window that reuses the user shuffle. All time and
    * value math is integer. */
  def resampleLocf(spark: SparkSession, dir: String): DataFrame = {
    val hourly = events(spark, dir)
      .select(col("user_id"),
        expr("ts DIV 1000000L DIV 3600000L").as("hour"),
        expr("CAST(floor(value * 1000000 + 0.5) AS BIGINT)").as("v_micros"))
      .groupBy(col("user_id"), col("hour"))
      .agg(max(col("v_micros")).as("sample"))
    val grid = hourly.groupBy(col("user_id"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("user_id"), explode(expr("sequence(h0, h1)")).as("hour"))
    val filled = grid.join(hourly, Seq("user_id", "hour"), "left")
      .withColumn("locf", last(col("sample"), ignoreNulls = true).over(
        Window.partitionBy(col("user_id")).orderBy(col("hour"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    filled.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_points"),
        count(col("sample")).as("n_observed"),
        sum(col("locf")).as("sum_filled_micros"))
      .orderBy(col("user_id"))
  }

  /** Gap-fill by LINEAR INTERPOLATION — [[resampleLocf]]'s sibling for
    * continuous signals (sensor series, prices): missing grid hours take
    * the straight line between the surrounding observations,
    * INTEGER-EXACT via the sign-split DIV device (numerator and
    * denominator kept non-negative in both branches, so Spark's
    * truncating DIV and DuckDB's flooring `//` agree bit-for-bit); the
    * tail past the last observation falls back to LOCF. Observed points
    * interpolate to themselves (the (hour − h_prev) factor is zero).
    *
    * Scale shape: identical to [[resampleLocf]] — ONE shuffle on
    * user_id; the grid explode, all four gap-bracketing windows and the
    * final aggregate reuse that partitioning. */
  def resampleLinear(spark: SparkSession, dir: String): DataFrame = {
    val hourly = events(spark, dir)
      .select(col("user_id"),
        expr("ts DIV 1000000L DIV 3600000L").as("hour"),
        expr("CAST(floor(value * 1000000 + 0.5) AS BIGINT)").as("v_micros"))
      .groupBy(col("user_id"), col("hour"))
      .agg(max(col("v_micros")).as("sample"))
    val grid = hourly.groupBy(col("user_id"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("user_id"), explode(expr("sequence(h0, h1)")).as("hour"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("hour"))
    val back = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = byUser.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = grid.join(hourly, Seq("user_id", "hour"), "left")
      .withColumn("v_prev", last(col("sample"), ignoreNulls = true).over(back))
      .withColumn("h_prev",
        last(when(col("sample").isNotNull, col("hour")), ignoreNulls = true).over(back))
      .withColumn("v_next", first(col("sample"), ignoreNulls = true).over(fwd))
      .withColumn("h_next",
        first(when(col("sample").isNotNull, col("hour")), ignoreNulls = true).over(fwd))
      .withColumn("interp", expr(
        """CASE WHEN v_next IS NULL OR h_next = h_prev THEN v_prev
          |     WHEN v_next >= v_prev THEN
          |       v_prev + ((v_next - v_prev) * (hour - h_prev)) DIV (h_next - h_prev)
          |     ELSE
          |       v_prev - ((v_prev - v_next) * (hour - h_prev)) DIV (h_next - h_prev)
          |END""".stripMargin))
    filled.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_points"),
        count(col("sample")).as("n_observed"),
        sum(col("interp")).as("sum_interp_micros"))
      .orderBy(col("user_id"))
  }

  /** Interval union — total COVERED time per user when each event opens a
    * 30-minute activity interval and intervals overlap (the
    * watch-time/uptime measure naive sum-of-durations double-counts).
    * The classic sweep: order intervals by start, a new segment begins
    * where an interval starts past the running max end (window max over
    * the preceding frame), segments number by running sum, and each
    * merged segment contributes `max(end) − min(start)`.
    *
    * Scale shape: ONE shuffle on user_id; both windows and the segment
    * aggregate reuse it (same contract as [[sessionize]]). Integer ms
    * everywhere; the window order (tms, event_id) is total so the
    * preceding-frame max is engine-independent. */
  def intervalUnion(spark: SparkSession, dir: String, spanMs: Long = 1800000L): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("tms"), col("event_id"))
    val runner = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val preceding = byUser.rowsBetween(Window.unboundedPreceding, -1)
    events(spark, dir)
      .select(col("user_id"), col("event_id"), expr("ts DIV 1000000L").as("tms"))
      .withColumn("end_ms", col("tms") + spanMs)
      .withColumn("prev_max_end", max(col("end_ms")).over(preceding))
      .withColumn("is_new",
        when(col("prev_max_end").isNull || col("tms") > col("prev_max_end"), 1L)
          .otherwise(0L))
      .withColumn("seg", sum(col("is_new")).over(runner))
      .groupBy(col("user_id"), col("seg"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("end_ms")) - min(col("tms"))).as("covered_ms"))
      .groupBy(col("user_id"))
      .agg(sum(col("n_events")).as("n_events"),
        count(lit(1)).as("n_segments"),
        sum(col("covered_ms")).as("covered_ms"))
      .orderBy(col("user_id"))
  }

  /** EWMA smoothing — per-user exponentially weighted moving average of
    * the spend series, the feature-engineering smoother every
    * click-stream model consumes (recency-weighted activity level).
    * Dyadic half-life form, truncated at 8 taps and scaled by 256 so it
    * is INTEGER-EXACT: w_t = Σ_{j=0..7} 2^(7−j) · cents_{t−j} (missing
    * taps at the head of a user's history contribute 0, exactly the
    * "EWMA warms up from zero" convention). Reported per user: the
    * smoothed value at the LAST event (selected by `max_by` over the
    * (tms, event_id) total order — an aggregate, not a second window)
    * plus the sum of all smoothed values as a whole-series checksum.
    *
    * Scale shape: ONE shuffle on user_id; the 8-tap lag window and the
    * final per-user aggregate both reuse it. The taps are a fixed
    * constant, so state per row is bounded; no unbounded frame. */
  def ewma(spark: SparkSession, dir: String, taps: Int = 8): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("tms"), col("event_id"))
    val weighted = (0 until taps).map { j =>
      coalesce(lag(col("cents"), j).over(byUser), lit(0L)) * lit(1L << (taps - 1 - j))
    }.reduce(_ + _)
    events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"), expr("ts DIV 1000000L").as("tms"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .withColumn("w", weighted)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        expr("max_by(w, struct(tms, event_id))").as("ewma_last_x256"),
        sum(col("w")).as("sum_ewma_x256"))
      .orderBy(col("user_id"))
  }

  /** Multi-touch attribution — the marketing-analytics classic: credit
    * each purchase's revenue to a touch channel under BOTH the
    * first-touch and last-touch models in one pass. A touch is any
    * view/click strictly preceding the purchase in the per-user
    * (tms, event_id) total order; purchases with no preceding touch
    * credit the 'organic' channel. The two models are the two ends of
    * the same ignoreNulls carry window (first() / last() over the
    * strictly-preceding frame), so one user-partitioned sort serves both.
    *
    * Scale shape: ONE shuffle on user_id shared by both carry windows,
    * then a tiny (model, channel) rollup. No event self-join — the
    * naive purchase×touch formulation is quadratic per user. */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("tms"), col("event_id"))
    val beforeMe = byUser.rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type").isin("view", "click"), col("event_type"))
    val credited = events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts DIV 1000000L").as("tms"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .withColumn("ft", first(touch, ignoreNulls = true).over(beforeMe))
      .withColumn("lt", last(touch, ignoreNulls = true).over(beforeMe))
      .filter(col("event_type") === "purchase")
    credited.select(lit("first").as("model"),
        coalesce(col("ft"), lit("organic")).as("channel"), col("cents"))
      .unionAll(credited.select(lit("last").as("model"),
        coalesce(col("lt"), lit("organic")).as("channel"), col("cents")))
      .groupBy(col("model"), col("channel"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("attributed_cents"))
      .orderBy(col("model"), col("channel"))
  }

  /** Activity streaks — gaps-and-islands over each user's distinct
    * active DAYS (the "7-day streak" engagement metric). The classic
    * device: on the per-user day sequence, `day − row_number()` is
    * constant exactly within a run of consecutive days, so grouping on
    * that anchor yields the islands without any self-join.
    *
    * Scale shape: one (user, day) distinct (map-side partial), then ONE
    * user shuffle reused by the row_number window, the island rollup and
    * the per-user summary. Integer epoch-day math throughout. */
  def streaks(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("day"))
    events(spark, dir)
      .select(col("user_id"), expr("ts DIV 86400000000000L").as("day"))
      .distinct()
      .withColumn("anchor", col("day") - row_number().over(byUser))
      .groupBy(col("user_id"), col("anchor"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("len")).as("max_streak"))
      .orderBy(col("user_id"))
  }

  /** OHLC bars — the time-series resample every market/metrics store
    * runs: per day, the opening value, high, low, close, volume and
    * turnover of the event value series. Open/close select by the
    * (tms, event_id) total order via `min_by`/`max_by` — so the WHOLE
    * query is one hash aggregate with map-side partials and NO window
    * function at all (the windowed formulation sorts every group; the
    * aggregate formulation keeps 2 candidate rows per partition per
    * day — the 100 TB-correct shape).
    *
    * Oracle note: DuckDB lacks arg_min over a composite key, so the
    * oracle replays open/close with row_number windows — two independent
    * formulations checking each other. */
  def ohlcBars(spark: SparkSession, dir: String): DataFrame = {
    events(spark, dir)
      .filter(col("value").isNotNull)
      .select(expr("ts DIV 86400000000000L").as("day"),
        col("event_id"), expr("ts DIV 1000000L").as("tms"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy(col("day"))
      .agg(expr("min_by(cents, struct(tms, event_id))").as("open"),
        max(col("cents")).as("high"),
        min(col("cents")).as("low"),
        expr("max_by(cents, struct(tms, event_id))").as("close"),
        count(lit(1)).as("n_events"),
        sum(col("cents")).as("turnover_cents"))
      .orderBy(col("day"))
  }

  /** TWAP — time-weighted average value per user: the integral of the
    * last-observation step function over the user's observed span,
    * divided by that span (the metric that makes irregular sampling
    * honest: a value that held for 6 hours counts 6 hours, not one
    * sample). Each observation holds until the next one (lead), so the
    * weighted mass is Σ cents·Δms — pure integer; the last observation
    * closes the span with weight 0, and single-event users fall back to
    * the plain value. Emitted as the exact mass, the span, and their
    * truncating quotient (all operands non-negative, so Spark DIV and
    * DuckDB // agree).
    *
    * Scale shape: ONE shuffle on user_id shared by the lead window and
    * the rollup — the same contract as [[sessionize]]. */
  def twap(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("tms"), col("event_id"))
    events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"), expr("ts DIV 1000000L").as("tms"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .withColumn("dur_ms", coalesce(lead(col("tms"), 1).over(byUser) - col("tms"), lit(0L)))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents") * col("dur_ms")).as("mass_cents_ms"),
        sum(col("dur_ms")).as("span_ms"),
        expr("max_by(cents, struct(tms, event_id))").as("last_cents"))
      .withColumn("twap_cents", expr(
        "CASE WHEN span_ms = 0 THEN last_cents ELSE mass_cents_ms DIV span_ms END"))
      .select(col("user_id"), col("n_events"), col("mass_cents_ms"),
        col("span_ms"), col("twap_cents"))
      .orderBy(col("user_id"))
  }

  /** Conversion-latency distribution — signup → first purchase: the
    * funnel metric [[funnelSteps]] does NOT give (it counts depth, not
    * latency). Per converting user, Δms between the first signup and
    * the first purchase strictly after it; reported as one row of exact
    * order statistics: count, min, LOWER MEDIAN (element ⌈n/2⌉ of the
    * (Δ, user) total order — deterministic, no interpolation, engine-
    * identical), max, and total.
    *
    * Scale shape: two per-user min-aggregates and a hash join — all on
    * the user key. The median window runs over the ALREADY-AGGREGATED
    * ≤|users| relation (the same size class as the |days| windows in
    * [[userGrowth]]/[[cusum]]), never over raw events. */
  def timeToConvert(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
      .select(col("user_id"), col("event_type"), expr("ts DIV 1000000L").as("tms"))
    val signup = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("tms")).as("t0"))
    val conv = e.filter(col("event_type") === "purchase")
      .join(signup, "user_id")
      .filter(col("tms") > col("t0"))
      .groupBy(col("user_id"), col("t0")).agg(min(col("tms")).as("t1"))
      .select(col("user_id"), (col("t1") - col("t0")).as("delta_ms"))
    import org.apache.spark.sql.graftbridge.Bridge.scalarSubquery
    val n = scalarSubquery(conv.agg(count(lit(1))))
    // min/max/sum ride in as ONE struct-valued scalar subquery — a
    // 1-row crossJoin would plan a nested-loop node for the same value
    val stats = scalarSubquery(conv
      .agg(min(col("delta_ms")).as("mn"), max(col("delta_ms")).as("mx"),
        sum(col("delta_ms")).as("sm"))
      .select(struct(col("mn"), col("mx"), col("sm")).as("s")))
    conv
      .withColumn("rn", row_number().over(
        Window.orderBy(col("delta_ms"), col("user_id"))).cast("long"))
      .withColumn("n", n)
      .filter(col("rn") === expr("(n + 1) DIV 2"))
      .withColumn("s", stats)
      .select(col("n").as("n_converters"), col("s.mn").as("min_ms"),
        col("delta_ms").as("median_ms"), col("s.mx").as("max_ms"),
        col("s.sm").as("sum_ms"))
  }

  /** Cohort retention (D1) — for each activity day, how many of its
    * active users return the NEXT day. The standard growth metric,
    * computed as one distinct (user, day) relation self-joined on
    * (user, day+1) — a hash equi join, never a window over the full
    * event table; day arithmetic is integer epoch-days. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val active = events(spark, dir)
      .select(col("user_id"), expr("ts DIV 1000000L DIV 86400000L").as("day"))
      .distinct()
    val next = active.select(col("user_id"), (col("day") - 1L).as("day"),
      lit(1L).as("returned"))
    active.join(next, Seq("user_id", "day"), "left")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(coalesce(col("returned"), lit(0L))).as("n_retained"))
      .orderBy(col("day"))
  }

  /** Robust per-group outlier detection: median + MAD (median absolute
    * deviation), the estimator that survives the outliers it hunts
    * (mean/stddev get dragged by the very tail being flagged). All
    * arithmetic is engine-exact: values quantize to integer micros, so
    * every interpolated median is either an integer or an exact .5 —
    * both engines compute `a + (b-a)/2` identically — and the flag
    * threshold `|v - med| > 3 · 1.4826 · mad` is one double multiply and
    * compare of identical operands.
    *
    * Scale shape: two grouped EXACT percentile aggregates (state is the
    * per-group distinct-value map — bounded here; approx_percentile is
    * the knob when value cardinality explodes), each result a ≤|groups|
    * relation that broadcast-joins back to the fact; the final pass is a
    * per-row compare + one aggregate with map-side partials. */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        expr("CAST(floor(value * 1000000 + 0.5) AS BIGINT)").as("micros"))
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(micros, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("absdev", abs(col("micros") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("percentile(absdev, 0.5)").as("mad"), min(col("med")).as("med"))
    dev.drop("med").join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        count(when(col("absdev") > lit(3.0) * lit(1.4826) * col("mad"), 1))
          .as("n_outliers"),
        min(col("med")).as("median_micros"),
        min(col("mad")).as("mad_micros"))
      .orderBy(col("event_type"))
  }

  /** Event-type co-occurrence (2-itemset support + lift) — the
    * market-basket audit over user behavior: for every unordered pair of
    * event types, how many users did both, and the lift vs independence.
    * The pair space is the DISTINCT (user, type) relation self-joined on
    * user with an ordering predicate — per-user fanout is bounded by the
    * type vocabulary (tiny), so the join output is |users|·O(vocab²),
    * never |events|²; the user-count denominators enter as one broadcast
    * dimension and a scalar subquery, no driver reads. */
  def cooccurrence(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    // NULL keys: a null user can't join-match and a null type can't pair,
    // but both WOULD skew the distinct-user denominator — drop them in
    // both engines identically
    val ut = events(spark, dir)
      .filter(col("event_type").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("event_type")).distinct()
    val perType = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n_type"))
    val nUsers = Bridge.scalarSubquery(
      ut.select(col("user_id")).distinct().agg(count(lit(1)).as("n")))
    val a = ut.select(col("user_id"), col("event_type").as("type_a"))
    val b = ut.select(col("user_id"), col("event_type").as("type_b"))
    a.join(b, Seq("user_id")).filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("support"))
      .join(broadcast(perType.select(col("event_type").as("type_a"),
        col("n_type").as("n_a"))), "type_a")
      .join(broadcast(perType.select(col("event_type").as("type_b"),
        col("n_type").as("n_b"))), "type_b")
      .select(col("type_a"), col("type_b"), col("support"),
        ((col("support") * nUsers).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Behavioral path mining: the most frequent 3-step event-type
    * sequences (consecutive per user, in event order) — the "what do
    * users do next" product-analytics staple, and the event-stream twin
    * of token n-gram counting. Trigrams form with two lead() calls over
    * ONE user shuffle (both windows share the (user, ts, event_id)
    * ordering, which is total — event_id breaks timestamp ties), then a
    * count aggregate with map-side partials over the tiny path vocabulary
    * and a TakeOrderedAndProject top-k. No self-joins: a join-based
    * trigram build would shuffle the event table three times. */
  def pathMining(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(spark, dir)
      .filter(col("event_type").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("t1", lead(col("event_type"), 1).over(byUser))
      .withColumn("t2", lead(col("event_type"), 2).over(byUser))
      .filter(col("t1").isNotNull && col("t2").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t1"), col("t2")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("path"))
      .limit(k)
  }

  /** Grouped top-k via the custom bounded-state aggregate
    * ([[graft.exprs.TopKAgg]]): per event type, the 5 most active users.
    * The window formulation ([[graft.ops.RelationalQueries.windowTopK]])
    * shuffles and sorts the whole per-key relation; `topk_agg` carries at
    * most 2k pairs of state per group through map-side partials, so the
    * final exchange ships |groups|·k fixed-width pairs. posexplode
    * unnests the result back to rank rows, which is also what makes the
    * operator oracle-mirrorable (row_number window in DuckDB). */
  def topkAgg(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.topk_agg
    val counts = events(spark, dir)
      .filter(col("event_type").isNotNull && col("user_id").isNotNull)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
    counts.groupBy(col("event_type"))
      .agg(topk_agg(col("user_id"), col("cnt"), 5).as("topk"))
      .select(col("event_type"), posexplode(col("topk")))
      .select(col("event_type"), (col("pos") + 1).cast("int").as("rank"),
        col("col.key").as("user_id"), col("col.score").as("cnt"))
      .orderBy(col("event_type"), col("rank"))
  }

  /** Typed multi-input per-key merge via `KeyValueGroupedDataset.cogroup`
    * — the Dataset escape hatch for per-key logic over TWO relations at
    * once that SQL can't express (custom reconciliation, ordered merges,
    * per-key state machines over both sides). The profile computed here
    * IS SQL-expressible on purpose — that's what makes it
    * oracle-mirrorable (two grouped aggregates full-outer-joined); the
    * operator surface under test is the typed cogroup itself. Scale
    * shape: both sides shuffle once on the key (same cost as the join
    * formulation) and each key's two iterators stream — per-key memory is
    * O(1) here because the merge folds; nothing materializes a group.
    * FP→integer quantization happens in SQL expressions BEFORE the typed
    * boundary, so both engines share the exact arithmetic. */
  def cogroupProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id").as("k"),
        expr("CAST(floor(coalesce(value, 0) * 1000000 + 0.5) AS BIGINT)").as("v"))
      .as[(Long, Long)]
    val cust = Tables.customer(spark, dir)
      .select(pmod(col("c_custkey"), lit(150L)).as("k"),
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("v"))
      .as[(Long, Long)]
    ev.groupByKey(_._1).cogroup(cust.groupByKey(_._1)) { (k, evs, cs) =>
      var ne = 0L; var sv = 0L
      evs.foreach { e => ne += 1; sv += e._2 }
      var nc = 0L; var sb = 0L
      cs.foreach { c => nc += 1; sb += c._2 }
      Iterator((k, ne, sv, nc, sb))
    }.toDF("user_id", "n_events", "sum_value_micros", "n_customers", "sum_acctbal_cents")
      .orderBy(col("user_id"))
  }

  /** Volume-burst detection: per (event_type, day), today's event count
    * against the trailing-7-day sum — the monitoring primitive behind
    * traffic-anomaly and data-freshness alerts. A day spikes when its
    * count exceeds 1.2× the trailing daily average; the comparison is the
    * integer cross-multiplication `35·n > 6·trail7` (n > (6/35)·trail7 ⇔
    * n > 1.2·trail7/7), so no division or float ever enters and both
    * engines decide boundaries identically. `n_trail_days` reports how
    * much history backs the flag (early days have a partial window).
    *
    * Scale shape: one aggregate to the (type, day) matrix — map-side
    * partials collapse the raw stream, so the window input is |types|·|days|
    * rows, NOT |events| — then a RANGE frame over day numbers inside each
    * type. The window partitions by event_type; its input is already tiny,
    * and at 100 TB nothing but the daily matrix ever shuffles twice. */
  def spikeDays(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .withColumn("day", expr("ts DIV 86400000000000L"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
    val trail = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rangeBetween(-7, -1)
    daily
      .withColumn("trail7", coalesce(sum(col("n")).over(trail), lit(0L)))
      .withColumn("n_trail_days", count(col("n")).over(trail))
      .withColumn("is_spike",
        col("n_trail_days") === 7L && col("n") * 35L > col("trail7") * 6L)
      .select(col("event_type"), col("day"), col("n"), col("trail7"),
        col("n_trail_days"), col("is_spike"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Count-min sketch frequency estimation: build one CMS over the
    * event_type stream ([[graft.functions.cms_agg]] — fixed 8 KiB state
    * through map-side partials), then probe every distinct type and put
    * the estimate next to the exact count. CMS guarantees cms_n >=
    * exact_n; with 5 keys in 4×256 cells the estimates are exact unless a
    * key collides in ALL four rows (probability ~(5/256)^4).
    *
    * Scale shape: this is the sketch whose point is 100 TB — the build
    * aggregates to ONE 1024-cell array with elementwise-add merges (vs the
    * exact groupBy's |keys|-sized shuffle), and the sketch reaches the
    * probe projection as a scalar subquery (one extra stage, shipped like
    * a broadcast variable; a 1-row join would plan BNLJ, which the plan
    * guardrails ban). The exact side here exists only as the oracle's
    * measuring stick. The hash family is integer-replayable in SQL — the
    * oracle recomputes every cell from the exact counts and takes the same
    * min, so the sketch arithmetic itself is value-checked, not just
    * bounded. */
  def cmsFrequency(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val sk = org.apache.spark.sql.graftbridge.Bridge.scalarSubquery(
      ev.agg(graft.functions.cms_agg(col("event_type")).as("sk")))
    ev.groupBy(col("event_type")).agg(count(lit(1)).as("exact_n"))
      .withColumn("cms_n", graft.functions.cms_estimate(sk, col("event_type")))
      .orderBy(col("event_type"))
  }

  /** Recency-weighted (exponentially decayed) event counts per type:
    * each event contributes 2^(-age_days) relative to the newest day in
    * the corpus — the freshness-weighting primitive behind trending
    * topics, decayed feature counts, and recency-biased sampling.
    *
    * Determinism without integers, by construction: every term is a
    * DYADIC rational 2^-k with k in [0, 30] (ages are whole days, bounded
    * by the corpus span), so each term is exact in an IEEE double and
    * every partial sum stays exact — the full sum needs < 44 mantissa
    * bits (2^13 span above, 2^-30 lsb below) against the 53 available.
    * Aggregation order therefore CANNOT change the value; both engines
    * produce bit-identical doubles with no decimal casts and no
    * quantization. (Contrast with the decimal-cast discipline float SUMs
    * need elsewhere — this operator chooses weights whose arithmetic is
    * closed under summation.)
    *
    * Scale shape: the newest day enters as a scalar subquery; the rest is
    * one map-side-partial aggregate over a per-row projection. */
  def decayCount(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).withColumn("day", expr("ts DIV 86400000000000L"))
    val maxDay = org.apache.spark.sql.graftbridge.Bridge.scalarSubquery(
      ev.agg(max(col("day"))))
    ev.withColumn("w", pow(lit(2.0), (col("day") - maxDay).cast("double")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("w")).as("decayed_n"))
      .orderBy(col("event_type"))
  }

  /** Rolling 7-day active users (WAU) per day — THE engagement metric, as
    * an exact distinct count over a sliding window. Sliding exact distinct
    * can't reuse a running aggregate (distinct doesn't subtract), so the
    * scalable form is contribution explode: each distinct (user, day)
    * pair fans out to the ≤7 window-end days it supports, then one
    * distinct + count per day. Work is 7·|distinct (user,day)| narrow
    * rows — linear in activity, independent of events-per-user skew
    * (the per-user dedup collapses hot users FIRST).
    *
    * Days come from the corpus's own [min_day+6, max_day] closed range so
    * every emitted day has a full window (the grid-fill operator handles
    * empty days; here absent days mean zero actives and are absent in
    * both engines). */
  def activeUsers(spark: SparkSession, dir: String): DataFrame = {
    val ud = events(spark, dir)
      .select(expr("ts DIV 86400000000000L").as("day"), col("user_id"))
      .distinct()
    val contrib = ud
      .select(col("user_id"), explode(expr("sequence(day, day + 6L)")).as("d"))
      .distinct()
    val bounds = org.apache.spark.sql.graftbridge.Bridge.scalarSubquery(
      ud.agg(max(col("day"))))
    val lo = org.apache.spark.sql.graftbridge.Bridge.scalarSubquery(
      ud.agg(min(col("day")) + lit(6L)))
    contrib.filter(col("d") <= bounds && col("d") >= lo)
      .groupBy(col("d").as("day"))
      .agg(count(lit(1)).as("wau"))
      .orderBy(col("day"))
  }

  /** Dense calendar scaffold: the complete (day × event_type) grid over
    * the corpus span with explicit zero counts — the gap-exposing fill
    * every monitoring/reporting layer needs (a day with NO events is the
    * most important day on the chart, and a plain groupBy can never emit
    * it). The grid builds from a sequence-explode over the scalar span ×
    * the distinct type dim — |days|·|types| rows from a one-row source,
    * NO cartesian/BNLJ node — then the daily counts LEFT-join in and
    * coalesce to zero.
    *
    * Scale: the grid is dimension-sized (days × types), the fact side
    * aggregates before joining; at 100 TB the join is grid-broadcast. */
  def gridFill(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).withColumn("day", expr("ts DIV 86400000000000L"))
    val daily = ev.groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n"))
    val lo = org.apache.spark.sql.graftbridge.Bridge.scalarSubquery(ev.agg(min(col("day"))))
    val hi = org.apache.spark.sql.graftbridge.Bridge.scalarSubquery(ev.agg(max(col("day"))))
    val gridDf = ev.select(col("event_type")).distinct()
      .withColumn("day", explode(sequence(lo, hi)))
    gridDf.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Point-in-time (PIT) join against the [[scd2]] versioned dimension:
    * each probe (user, t) resolves to the state version whose
    * `[valid_from, valid_to)` interval covers t — the feature-store
    * lookup that makes training labels leakage-free ("what did we know
    * about this user AT example time", never after). Probes here are the
    * event stream shifted +30 min (state half an hour later); probes
    * before a user's first interval legitimately resolve to no version
    * and report version −1.
    *
    * Scale shape: ONE hash equi join on user_id — the interval predicate
    * is a post-filter, and per-user interval counts are bounded by that
    * user's own change history, so the join fanout is |probes| ·
    * |covering intervals| = |probes| (intervals are disjoint by
    * construction; at most one covers t). The SCD2 build itself reuses
    * [[scd2]]'s one-shuffle plan. */
  def pitJoin(spark: SparkSession, dir: String): DataFrame = {
    val dim = scd2(spark, dir)
      .select(col("user_id"), col("version"), col("state"),
        col("valid_from_ms"), col("valid_to_ms"))
    val probes = events(spark, dir)
      .select(col("user_id").as("p_user"),
        (expr("ts DIV 1000000L") + lit(1800000L)).as("t"))
    // the covering predicate lives IN the join condition (hash join on the
    // equi key, interval test as the join filter): a probe no interval
    // covers survives as a left-null row and reports version -1 — a
    // post-join filter would silently drop it instead
    probes.join(dim,
        col("p_user") === dim("user_id") &&
          dim("valid_from_ms") <= col("t") &&
          (dim("valid_to_ms").isNull || col("t") < dim("valid_to_ms")),
        "left")
      .groupBy(col("p_user").as("user_id"),
        coalesce(col("version"), lit(-1L)).as("version"),
        coalesce(col("state"), lit("none")).as("state"))
      .agg(count(lit(1)).as("n_probes"))
      .orderBy(col("user_id"), col("version"))
  }

  /** First-order Markov transition matrix over per-user event streams:
    * P(next event type | current type) in exact integer micros — the
    * user-behavior model behind next-action prediction, anomaly scoring
    * (improbable transitions), and simulation. Consecutive pairs come
    * from ONE lead() over the per-user time order (the same single
    * shuffle [[pathMining]] uses, not an event self-join); the
    * denominator cascades from the pair counts, so the stream is read
    * once. Probabilities are `(10^6·n) DIV n_from` — both engines divide
    * identically, no floats.
    *
    * Scale shape: one shuffle on user_id for the window, then an
    * aggregate over the |types|² transition vocabulary with map-side
    * partials. */
  def markovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = events(spark, dir)
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = pairs.groupBy(col("from_type")).agg(sum(col("n")).as("n_from"))
    pairs.join(fromTotals, "from_type")
      .withColumn("p_micro", expr("(1000000 * n) DIV n_from"))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        col("p_micro"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** 2-D histogram (heat map): hour-of-day × equal-width value bucket —
    * the seasonality-vs-magnitude profile a monitoring dashboard bins
    * before rendering. The hour axis is intrinsic integer arithmetic on
    * the nanos epoch; the value axis reuses [[histogram]]'s bounds law
    * (driver-read min/max — the reference's own bounds-collect shape —
    * fixed width, top bucket closed via least()). One aggregate with
    * map-side partials; output is ≤ 24·ybins rows regardless of input
    * size. Same empty-input guard as the 1-D histogram. */
  def histogram2d(spark: SparkSession, dir: String, ybins: Int = 10): DataFrame = {
    val ev = events(spark, dir).select(col("ts"), col("value"))
      .filter(col("value").isNotNull)
    val b = ev.agg(min(col("value")), max(col("value"))).head()
    if (b.isNullAt(0))
      return ev.limit(0).select(lit(0).as("hour"), lit(0).as("vbucket"),
        lit(0L).as("n"))
    val (lo, hi) = (b.getDouble(0), b.getDouble(1))
    val w = if (hi == lo) 1.0 else (hi - lo) / ybins
    ev.withColumn("hour", expr("(ts DIV 3600000000000L) % 24").cast("int"))
      .withColumn("vbucket",
        least(floor((col("value") - lit(lo)) / lit(w)), lit((ybins - 1).toDouble))
          .cast("int"))
      .groupBy(col("hour"), col("vbucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("hour"), col("vbucket"))
  }

  /** Audience-overlap estimation via KMV distinct sketches
    * (`graft.functions.kmv_agg`): distinct 'click' vs 'view' users, their
    * UNION and INTERSECTION sizes and Jaccard — the sketch-algebra
    * problem HLL cannot answer (inclusion–exclusion on HLL subtracts two
    * noisy numbers; the KMV merged sketch estimates the intersection
    * directly, Beyer et al. 2007). Exact audit columns ride along, the
    * [[cmsFrequency]] pattern.
    *
    * All estimator arithmetic is integer: hashes are the house
    * multiplicative kernel (trainSplit's) reduced mod 2³¹, estimates are
    * (k−1)·2³¹ DIV h_(k), and the set algebra over the returned sorted
    * arrays is array_union/slice/filter — closed forms an oracle replays
    * verbatim. Membership duality (proven in the scaladoc of
    * [[graft.exprs.KmvAgg]]'s query): for x in the merged sketch,
    * x ∈ sketch(A) ⟺ x ∈ A, so the oracle may test full-set membership
    * where the engine tests the k-truncated arrays — bit-identical.
    *
    * Scale shape: each sketch is ONE aggregate over a filtered scan
    * (map-side partials, ≤k longs of state); the exact audit columns are
    * the only corpus-sized aggregations, and they drop out in production
    * use. Nothing joins; the final row is scalar-subquery assembly. */
  def kmvOverlap(spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge.scalarSubquery
    val M = 2147483648L // hash modulus 2^31
    val ev = events(spark, dir)
    def hashed(t: String) = ev.filter(col("event_type") === t)
      .select(col("user_id"),
        pmod(pmod(col("user_id"), lit(1000000007L)) * lit(2654435761L), lit(M)).as("h"))
    val ska = scalarSubquery(hashed("click").agg(graft.functions.kmv_agg(col("h"), k)))
    val skb = scalarSubquery(hashed("view").agg(graft.functions.kmv_agg(col("h"), k)))
    val naEx = scalarSubquery(hashed("click").agg(countDistinct(col("user_id"))))
    val nbEx = scalarSubquery(hashed("view").agg(countDistinct(col("user_id"))))
    val interEx = scalarSubquery(
      ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_type")).distinct()
        .groupBy(col("user_id")).agg(count(lit(1)).as("nt"))
        .filter(col("nt") === 2).agg(count(lit(1))))
    spark.range(1)
      .select(lit(k).as("k"), ska.as("ska"), skb.as("skb"),
        naEx.as("n_a_exact"), nbEx.as("n_b_exact"), interEx.as("inter_exact"))
      .withColumn("merged", expr(s"slice(array_sort(array_union(ska, skb)), 1, $k)"))
      .withColumn("m_size", expr("size(merged)"))
      .withColumn("n_a_est", expr(
        s"CASE WHEN size(ska) < $k THEN CAST(size(ska) AS BIGINT) " +
          s"ELSE (CAST(${k - 1} AS BIGINT) * $M) DIV element_at(ska, $k) END"))
      .withColumn("n_b_est", expr(
        s"CASE WHEN size(skb) < $k THEN CAST(size(skb) AS BIGINT) " +
          s"ELSE (CAST(${k - 1} AS BIGINT) * $M) DIV element_at(skb, $k) END"))
      .withColumn("union_est", expr(
        s"CASE WHEN m_size < $k THEN CAST(m_size AS BIGINT) " +
          s"ELSE (CAST(${k - 1} AS BIGINT) * $M) DIV element_at(merged, $k) END"))
      .withColumn("inter_cnt", expr(
        "CAST(size(filter(merged, x -> array_contains(ska, x) " +
          "AND array_contains(skb, x))) AS BIGINT)"))
      .withColumn("inter_est", expr(
        s"CASE WHEN m_size < $k THEN inter_cnt " +
          s"ELSE (inter_cnt * union_est) DIV $k END"))
      .withColumn("jaccard_ppm", expr("(1000000 * inter_cnt) DIV greatest(m_size, 1)"))
      .select(col("k"), col("n_a_est"), col("n_a_exact"),
        col("n_b_est"), col("n_b_exact"), col("union_est"),
        col("inter_est"), col("inter_exact"), col("jaccard_ppm"))
  }

  /** Quantile-sketch re-aggregation audit — the quantile member of the
    * "sketch once, roll up anywhere" family ([[sketchReagg]] is the
    * distinct-count member): per (event_type, day) MRL summaries of
    * exact value cents are the stored daily cube; `mrl_merge_agg`
    * reconstructs each summary's level structure from its power-of-two
    * weights and folds the cube per type WITHOUT re-touching raw events;
    * the per-type median estimate then faces the exact rank audit.
    *
    * Unlike KMV, MRL merge is bound-preserving, not bit-equal to
    * rebuild — so the OUTPUT is the audit verdict (n, in_spec), never
    * the merge-order-dependent estimate itself; the oracle emits the
    * exact counts and TRUE (the [[RelationalQueries.quantileSketchAudit]]
    * contract-mirror device). Bound: the deterministic N·L/(2k) rank
    * error survives any merge tree (Agarwal et al. 2013); at k=512 and
    * these scales the analytic bound is ≈1%, audited at 2% — L grows as
    * log₂(N/k), so a 10¹²-row deployment re-widens the gate accordingly.
    *
    * Scale shape: cube build = one aggregate, O(k log) state per cell;
    * the rollup re-aggregates |cells| sketch rows; the estimate readout
    * windows over the BOUNDED weights relation (≤ k·L rows per type);
    * the audit is one conditional aggregate over the raw relation. */
  def quantileReagg(spark: SparkSession, dir: String, k: Int = 512): DataFrame = {
    val v = events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), expr("ts DIV 86400000000000L").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
    val cube = v.groupBy(col("event_type"), col("day"))
      .agg(graft.functions.mrl_agg(col("cents"), k).as("sk"))
    val merged = cube.groupBy(col("event_type"))
      .agg(graft.functions.mrl_merge_agg(col("sk"), k).as("sk"))
    val weights = merged.select(col("event_type"), explode(col("sk")).as("p"))
      .groupBy(col("event_type"), col("p.v").as("v")).agg(sum(col("p.w")).as("w"))
    val n = v.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val cum = weights.withColumn("cum",
      sum(col("w")).over(Window.partitionBy(col("event_type")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, 0)))
    val est = cum.join(n, "event_type")
      .filter(col("cum") >= ceil(col("n") * 0.5).cast("long"))
      .groupBy(col("event_type")).agg(min(col("v")).as("est"))
    v.join(est, "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("cents") < col("est"), 1L).otherwise(0L)).as("r_lt"),
        sum(when(col("cents") <= col("est"), 1L).otherwise(0L)).as("r_le"))
      .withColumn("target", ceil(col("n") * 0.5).cast("long"))
      .withColumn("bound", ceil(col("n") * 0.02).cast("long"))
      .select(col("event_type"), col("n"),
        (col("n") === 0L ||
          (col("target") <= col("r_le") + col("bound") &&
           col("target") >= col("r_lt") + 1L - col("bound"))).as("in_spec"))
      .orderBy(col("event_type"))
  }

  /** Peak concurrency per day — the sweep-line occupancy operator
    * (concurrent sessions / licenses in use / live connections): each
    * user's active span for a day becomes a (+1 at start, −1 at end)
    * event pair, and the running sum of the time-ordered deltas is the
    * live count whose per-day MAX is the answer.
    *
    * Determinism device: the window orders by (t, delta DESC) with the
    * DEFAULT RANGE frame, so all PEERS (same t, same delta) share the
    * block-end running value — starts count before ends at the same
    * millisecond (touching spans overlap, the closed-interval
    * convention), and the within-block permutation both engines might
    * disagree on never surfaces. A single-event span (+1 and −1 at the
    * same t) is counted during its +1 block.
    *
    * Scale shape: one (user, day) rollup with map-side partials builds
    * the spans; the sweep window partitions by DAY — the sort is
    * |active users that day| per task, never the corpus; a
    * hotter-than-memory day would swap in the two-phase global-rank
    * device (`ops.Ranks`). One shuffle serves both the window and the
    * final per-day aggregate. */
  def maxConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val spans = events(spark, dir)
      .withColumn("tms", expr("ts DIV 1000000L"))
      .withColumn("day", expr("tms DIV 86400000L"))
      .groupBy(col("user_id"), col("day"))
      .agg(min(col("tms")).as("t0"), max(col("tms")).as("t1"))
    val pts = spans.select(col("day"), col("t0").as("t"), lit(1L).as("delta"))
      .union(spans.select(col("day"), col("t1").as("t"), lit(-1L).as("delta")))
    val sweep = Window.partitionBy(col("day"))
      .orderBy(col("t").asc, col("delta").desc) // default RANGE frame: peers share
    pts.withColumn("live", sum(col("delta")).over(sweep))
      .groupBy(col("day"))
      .agg(sum(when(col("delta") === 1L, 1L)).as("n_users"),
        max(col("live")).as("max_concurrent"))
      .orderBy(col("day"))
  }

  /** Sketch re-aggregation rollup — the "sketch once, roll up anywhere"
    * cube pattern (ClickHouse AggregatingMergeTree, Druid sketch
    * columns): build ONE KMV sketch per (event_type, day) cell — the
    * materialized daily cube — then answer the per-type distinct-user
    * question by MERGING the stored sketches (`kmv_merge_agg`), never
    * re-touching raw events. The mergeable-summaries law (merge ==
    * rebuild, property-tested in `KmvAggProps`) makes the re-aggregated
    * estimate bit-identical to a direct sketch of the raw data — which
    * is exactly what lets the oracle compute the k smallest distinct
    * hashes straight from events. Exact audit + error ppm ride along.
    *
    * Scale shape: the cube build is one aggregate with ≤k longs of
    * state per cell (map-side partials); the rollup re-aggregates
    * |cells| rows, each k longs — raw data is touched once at cube
    * build, every later rollup reads only sketches. */
  def sketchReagg(spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val M = 2147483648L // hash modulus 2^31
    val ev = events(spark, dir)
      .select(col("event_type"), expr("ts DIV 86400000000000L").as("day"),
        pmod(pmod(col("user_id"), lit(1000000007L)) * lit(2654435761L), lit(M)).as("h"),
        col("user_id"))
    val dailyCube = ev.groupBy(col("event_type"), col("day"))
      .agg(graft.functions.kmv_agg(col("h"), k).as("sk"))
    val reagg = dailyCube.groupBy(col("event_type"))
      .agg(graft.functions.kmv_merge_agg(col("sk"), k).as("sk"))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    reagg.join(exact, "event_type")
      .withColumn("n_est", expr(
        s"CASE WHEN size(sk) < $k THEN CAST(size(sk) AS BIGINT) " +
          s"ELSE (CAST(${k - 1} AS BIGINT) * $M) DIV element_at(sk, $k) END"))
      .withColumn("err_ppm", expr(
        "(1000000 * abs(n_est - n_exact)) DIV greatest(n_exact, 1)"))
      .select(col("event_type"), col("n_est"), col("n_exact"), col("err_ppm"))
      .orderBy(col("event_type"))
  }

  /** Theil–Sen robust trend estimator (Theil 1950, Sen 1968) over the
    * daily revenue series: the MEDIAN of all pairwise slopes — 29.3%
    * breakdown point, so outlier days (an ingest gap, a flash spike) do
    * not drag the trend the way OLS's single-point leverage does. The
    * robust complement of regr_slope for monitoring pipelines.
    *
    * Exactness device: amounts ride the exact-cents funnel, each pairwise
    * slope is emitted as sign(Δy)·((10⁶·|Δy|) DIV Δx) — sign-split
    * because Spark's DIV truncates toward zero while DuckDB's // floors,
    * which disagree on negatives — and the median is the LOWER median
    * (row (n+1) DIV 2 of the slope-sorted pairs), deterministic in both
    * engines. DECIMAL(38,0) product lane per the chiSquare ceiling.
    *
    * Scale shape: the data-sized pass is ONE day rollup (map-side
    * partials); the pairwise stage is |days|² on the TINY daily relation
    * — time is a bounded dimension (a decade is ~3.7k days → ~7M pairs,
    * one task's work), so 100 TB grows the rollup, not the pair stage. */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .withColumn("day", expr("ts DIV 86400000000000L"))
      .withColumn("cents", expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
      .groupBy(col("day")).agg(sum(col("cents")).as("y"))
      .localCheckpoint(eager = true)
    val pairs = daily.select(col("day").as("xa"), col("y").as("ya"))
      .join(daily.select(col("day").as("xb"), col("y").as("yb")),
        col("xa") < col("xb"))
      .withColumn("slope_micro", expr(
        """CAST(CASE WHEN yb >= ya
          |  THEN (CAST(1000000 AS DECIMAL(38,0)) * (yb - ya)) DIV (xb - xa)
          |  ELSE -((CAST(1000000 AS DECIMAL(38,0)) * (ya - yb)) DIV (xb - xa))
          |END AS BIGINT)""".stripMargin))
    // lower median by rank: rn carries the global slope order, np the
    // pair count (both windows share the one tiny-relation sort); the
    // median row filter keeps everything scalar-subquery-assembled — one
    // output row even on an empty corpus (NULL slope, 0 counts)
    val ranked = pairs
      .withColumn("rn",
        row_number().over(Window.orderBy(col("slope_micro"), col("xa"), col("xb"))))
      .withColumn("np", count(lit(1)).over(Window.partitionBy()))
    import org.apache.spark.sql.graftbridge.Bridge.scalarSubquery
    val nDays = scalarSubquery(daily.agg(count(lit(1))))
    val nPairs = scalarSubquery(pairs.agg(count(lit(1))))
    val medianSlope = scalarSubquery(
      ranked.filter(expr("rn = (np + 1) DIV 2")).select(col("slope_micro")))
    spark.range(1)
      .select(nDays.as("n_days"), nPairs.as("n_pairs"),
        medianSlope.as("sen_slope_micro"))
  }

  /** Two-proportion A/B significance test (the pooled two-sample z-test
    * every experimentation platform runs): users split into arms by the
    * house deterministic hash, conversion = "has ≥1 purchase event",
    * and the z-statistic decides whether the conversion-rate difference
    * survives noise.
    *
    * Exactness device (the [[SpatialCluster.getisOrd]] trick): with
    * c₁/n₁, c₂/n₂ the arm conversions and C = c₁+c₂, N = n₁+n₂, the
    * pooled z² is the all-integer rational
    *   z² = (c₁·n₂ − c₂·n₁)² · N / (n₁ · n₂ · C · (N − C)),
    * so the emitted columns are the difference sign and z²·10⁶ DIV den
    * in DECIMAL(38,0) lanes, and the significance verdict (z² against
    * 1.96² = 3841600 micro) is decided on the same integer in both
    * engines — no sqrt, no float.
    *
    * Scale shape: one per-user rollup (map-side partials), one 2-row
    * conditional aggregate, scalar assembly. */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    val perUser = events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("converted"))
      .withColumn("arm",
        pmod(pmod(col("user_id"), lit(1000000007L)) * lit(2654435761L), lit(2L)))
    val arms = perUser.agg(
      count(when(col("arm") === 0L, 1)).as("n1"),
      count(when(col("arm") === 1L, 1)).as("n2"),
      coalesce(sum(when(col("arm") === 0L, col("converted"))), lit(0L)).as("c1"),
      coalesce(sum(when(col("arm") === 1L, col("converted"))), lit(0L)).as("c2"))
    arms
      .withColumn("num", expr(
        "CAST(c1 AS DECIMAL(38,0)) * n2 - CAST(c2 AS DECIMAL(38,0)) * n1"))
      .withColumn("den", expr(
        """CAST(n1 AS DECIMAL(38,0)) * n2 * (c1 + c2)
          | * (CAST(n1 AS DECIMAL(38,0)) + n2 - c1 - c2)""".stripMargin))
      .withColumn("z_sign", expr(
        "CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END AS INT)"))
      .withColumn("z_sq_micro", expr(
        """CASE WHEN den = 0 THEN CAST(0 AS BIGINT)
          |ELSE CAST((1000000 * num * num * (CAST(n1 AS DECIMAL(38,0)) + n2))
          |          DIV den AS BIGINT) END""".stripMargin))
      .select(col("n1"), col("c1"), col("n2"), col("c2"), col("z_sign"),
        col("z_sq_micro"),
        expr("z_sq_micro > 3841600").as("significant_95"))
  }

  /** Deterministic Poisson bootstrap — the cluster-scale resampling
    * device (Chamandy et al., "Estimating Uncertainty for Massive Data
    * Streams", Google 2012): a classic bootstrap needs B global n-sized
    * resamples (impossible without B full shuffles of the corpus), while
    * the Poisson bootstrap gives each row an iid Poisson(1) weight per
    * replicate, turning resampling into ONE streaming pass with B
    * counters per group — the only bootstrap that survives 100 TB.
    *
    * Determinism device: the "draw" for (order, replicate b) is the
    * 60-bit md5 prefix of `orderkey:b` — a uniform both engines compute
    * bit-identically — inverted through the Poisson(1) CDF whose six
    * cumulative thresholds are fixed 15-hex-digit string literals
    * (lexicographic order over fixed-width lowercase hex == numeric
    * order, the sourceMix comparator). Weights cap at 6 (P(W>5) ≈ 6e-4;
    * the cap is part of the operator's definition, shared by the oracle).
    *
    * Output: per (o_orderpriority, replicate) the effective row count,
    * exact resampled spend in cents, and the replicate mean via integer
    * DIV — the across-replicate dispersion of `mean_cents` IS the
    * bootstrap standard error of the group mean.
    *
    * Scale shape: explode(sequence(0, B-1)) is a per-row generator (no
    * shuffle); the single aggregate takes map-side partials, so ≤
    * |groups|·B fixed-width rows ever shuffle regardless of corpus size. */
  def poissonBootstrap(spark: SparkSession, dir: String, reps: Int = 32): DataFrame = {
    // floor(2^60 · P(W≤k)) for W ~ Poisson(1), k = 0..5, as fixed-width hex
    val cdfHex = Seq("5e2d58d8b3bce00", "bc5ab1b16779c00", "eb715e1dc158300",
      "fb23979734a2580", "ff1025f59174e00", "ffd90f3ba405600")
    val u = "substring(md5(concat(CAST(o_orderkey AS STRING), ':', CAST(b AS STRING))), 1, 15)"
    val w = cdfHex.zipWithIndex
      .map { case (t, k) => s"WHEN $u < '$t' THEN ${k}L" }
      .mkString("CASE ", " ", " ELSE 6L END")
    orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority").as("priority"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .withColumn("b", explode(sequence(lit(0), lit(reps - 1))))
      .withColumn("w", expr(w))
      .groupBy(col("priority"), col("b"))
      .agg(sum(col("w")).as("n_eff"), sum(col("w") * col("cents")).as("sum_cents"))
      .withColumn("mean_cents",
        expr("CASE WHEN n_eff > 0 THEN sum_cents DIV n_eff ELSE NULL END"))
      .orderBy(col("priority"), col("b"))
  }

  /** Gini concentration of spend (the Lorenz-curve coefficient, the
    * standard whale-dependence metric for revenue): per-user lifetime
    * value in exact cents, then G = (2·Σᵢ i·yᵢ − (n+1)·Σy) / (n·Σy)
    * over the value-ranked users — 0 = equal spend, →1 = all revenue
    * from one user.
    *
    * Exactness device: the rank weights come from ONE row_number window
    * over (value, user_id) — a total order, so both engines weight
    * identically — and the coefficient is emitted as ppm via integer
    * DIV in DECIMAL(38,0) lanes (Σ i·yᵢ reaches n·Σy ≈ 10²³ at
    * trillion-row scale — inside precision 38).
    *
    * Scale shape: one per-user rollup, one |users|-sized global-order
    * window (the sort is users, not events), single-row output. */
  def giniSpend(spark: SparkSession, dir: String): DataFrame = {
    val perUser = events(spark, dir)
      .withColumn("cents", expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
      .groupBy(col("user_id")).agg(sum(col("cents")).as("y"))
    // scalable global rank (Ranks.withGlobalRank, the zipWithIndex
    // device) — a global-order window would sort every user in one task
    val ranked = Ranks.withGlobalRank(perUser, "i", col("y"), col("user_id"))
    ranked.agg(count(lit(1)).as("n_users"),
        coalesce(sum(col("y")), lit(0L)).as("total_cents"),
        coalesce(sum(expr("CAST(i AS DECIMAL(38,0)) * y")),
          expr("CAST(0 AS DECIMAL(38,0))")).as("wsum"))
      .withColumn("gini_ppm", expr(
        """CASE WHEN n_users * total_cents = 0 THEN CAST(0 AS BIGINT)
          |ELSE CAST((1000000 * (2 * wsum - (CAST(n_users AS DECIMAL(38,0)) + 1) * total_cents))
          |          DIV (CAST(n_users AS DECIMAL(38,0)) * total_cents) AS BIGINT)
          |END""".stripMargin))
      .select(col("n_users"), col("total_cents"), col("gini_ppm"))
  }

  /** EXACT audience overlap via membership bitmaps
    * (`graft.functions.bitmap_agg`, the ClickHouse groupBitmap shape) —
    * the same click/view question [[kmvOverlap]] ESTIMATES, answered
    * exactly while the id universe is bounded: one bitmap per event
    * type (fixed universe/8 bytes of state through map-side partials),
    * then the whole set algebra as zip_with/bit_count column
    * expressions over the two word arrays. Because the bitmap is exact,
    * the oracle is plain COUNT(DISTINCT)/INTERSECT SQL — no kernel
    * replay, which is itself the correctness statement.
    *
    * Scale shape: two filtered single-pass aggregates (no distinct
    * shuffle — the bitmap IS the distinct), scalar assembly; the
    * documented boundary is the universe bound (here 2²¹ ids = 256 KiB
    * per sketch, sized to hold the event-id space through sf1; past
    * ~2²⁶ switch to [[kmvOverlap]]). */
  def bitmapOverlap(spark: SparkSession, dir: String, universe: Int = 2097152): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge.scalarSubquery
    val ev = events(spark, dir)
    // two genuinely partial event-id cohorts: clicks vs high-value events
    // (≈ half the value range) — their intersection is high-value clicks
    def bm(pred: org.apache.spark.sql.Column) = scalarSubquery(
      ev.filter(pred).agg(graft.functions.bitmap_agg(col("event_id"), universe)))
    spark.range(1)
      .select(bm(col("event_type") === "click").as("a"),
        bm(col("value") > 100.0).as("b"))
      .withColumn("n_click", expr(
        "aggregate(transform(a, w -> CAST(bit_count(w) AS BIGINT)), CAST(0 AS BIGINT), (s, x) -> s + x)"))
      .withColumn("n_highval", expr(
        "aggregate(transform(b, w -> CAST(bit_count(w) AS BIGINT)), CAST(0 AS BIGINT), (s, x) -> s + x)"))
      .withColumn("n_inter", expr(
        "aggregate(zip_with(a, b, (x, y) -> CAST(bit_count(x & y) AS BIGINT)), CAST(0 AS BIGINT), (s, x) -> s + x)"))
      .withColumn("n_union", expr(
        "aggregate(zip_with(a, b, (x, y) -> CAST(bit_count(x | y) AS BIGINT)), CAST(0 AS BIGINT), (s, x) -> s + x)"))
      .withColumn("jaccard_ppm", expr("(1000000 * n_inter) DIV greatest(n_union, 1)"))
      .select(col("n_click"), col("n_highval"), col("n_inter"), col("n_union"),
        col("jaccard_ppm"))
  }

  /** RFM segmentation (the recency/frequency/monetary quintile grid —
    * direct-marketing's standard customer-value partition): per user the
    * last-active day, event count, and lifetime cents, each cut into
    * quintiles by `ntile(5)`, then the population of every RFM cell.
    *
    * Determinism: ntile is purely rank-arithmetic (⌈n·k/N⌉ boundaries,
    * identical in Spark and DuckDB) once the ORDER is total — every
    * window orders by (metric, user_id). Output ≤125 cells regardless of
    * input size; cell monetary means are integer cents DIV.
    *
    * Scale shape: one per-user rollup, three |users|-sized windows
    * (users, not events), one bounded-key rollup. The global-order ntile
    * windows are the documented single-task ceiling here (fine to ~10⁸
    * users); past that, derive each quintile from
    * [[Ranks.withGlobalRank]] with the standard uneven-bucket closed
    * form — rank and ntile are interconvertible. */
  def rfm(spark: SparkSession, dir: String): DataFrame = {
    val perUser = events(spark, dir)
      .withColumn("cents", expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
      .withColumn("day", expr("ts DIV 86400000000000L"))
      .groupBy(col("user_id"))
      .agg(max(col("day")).as("last_day"), count(lit(1)).as("freq"),
        sum(col("cents")).as("monetary"))
    val scored = perUser
      .withColumn("r_q", ntile(5).over(Window.orderBy(col("last_day"), col("user_id"))))
      .withColumn("f_q", ntile(5).over(Window.orderBy(col("freq"), col("user_id"))))
      .withColumn("m_q", ntile(5).over(Window.orderBy(col("monetary"), col("user_id"))))
    scored.groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_users"), sum(col("monetary")).as("cell_cents"))
      .withColumn("avg_cents", expr("cell_cents DIV n_users"))
      .select(col("r_q"), col("f_q"), col("m_q"), col("n_users"), col("avg_cents"))
      .orderBy(col("r_q"), col("f_q"), col("m_q"))
  }

  /** N-step strict-order windowed funnel (ClickHouse `windowFunnel`
    * semantics, which vanilla Spark lacks): how deep each user gets
    * through signup → view → click → purchase with every later step
    * STRICTLY after the previous one and the whole chain inside T of
    * step 1. The existing [[funnel]] is the 2-step conversion-rate
    * variant; this is the depth histogram product analytics reads.
    *
    * Earliest-chain semantics (the deterministic contract): t₁ = FIRST
    * signup anchors the window; tᵢ = first step-i event with
    * tᵢ₋₁ < tᵢ ≤ t₁+T. Given that anchor, greedy-earliest is optimal
    * (an earlier feasible tᵢ only enlarges tᵢ₊₁'s feasible set), so the
    * depth is well-defined; a user whose DEEPEST chain starts at a later
    * signup reports the first-anchor depth — the documented trade for a
    * sort-free distributed shape.
    *
    * Scale shape: one grouped min per step over a per-step filtered
    * scan, chained by |users|-keyed hash joins — step count is the only
    * multiplier, nothing is ever sorted per user. Output ≤ steps+1
    * rows. */
  def funnelSteps(spark: SparkSession, dir: String,
                  windowMs: Long = 12 * 3600000L): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), col("event_type"), expr("ts DIV 1000000L").as("tms"))
    def stepMin(tpe: String, prev: DataFrame): DataFrame =
      ev.filter(col("event_type") === tpe)
        .join(prev, "user_id")
        .filter(col("tms") > col("tp") && col("tms") <= col("t1") + windowMs)
        .groupBy(col("user_id")).agg(min(col("tms")).as("tn"), min(col("t1")).as("t1x"))
        .select(col("user_id"), col("tn").as("tp"), col("t1x").as("t1"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("tms")).as("tp"))
      .withColumn("t1", col("tp"))
    val s2 = stepMin("view", s1)
    val s3 = stepMin("click", s2)
    val s4 = stepMin("purchase", s3)
    val depth = s1.select(col("user_id"), lit(1).as("d"))
      .unionAll(s2.select(col("user_id"), lit(2).as("d")))
      .unionAll(s3.select(col("user_id"), lit(3).as("d")))
      .unionAll(s4.select(col("user_id"), lit(4).as("d")))
      .groupBy(col("user_id")).agg(max(col("d")).as("depth"))
    depth.groupBy(col("depth")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("depth"))
  }

  /** Day-of-week seasonal decomposition (the multiplicative seasonal
    * index of classical decomposition, restricted to the weekly cycle):
    * per weekday, the ratio of its mean daily revenue to the overall
    * mean daily revenue, in micro units — the first thing a forecasting
    * pipeline factors out before trend fitting.
    *
    * Exactness device: index = (10⁶ · dow_cents · n_days) DIV
    * (n_dow_days · total_cents) — one cross-multiplied integer DIV, no
    * per-day mean ever materializes. Weekday anchor: epoch day 0
    * (1970-01-01) was a Thursday, so dow = (day + 4) % 7 gives 0 =
    * Sunday … 6 = Saturday.
    *
    * Scale shape: one day rollup, one ≤7-key rollup, two global scalars
    * broadcast back. */
  def seasonality(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .withColumn("day", expr("ts DIV 86400000000000L"))
      .withColumn("cents", expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
      .groupBy(col("day")).agg(sum(col("cents")).as("y"))
      .localCheckpoint(eager = true)
    import org.apache.spark.sql.graftbridge.Bridge.scalarSubquery
    val nDays = scalarSubquery(daily.agg(count(lit(1))))
    val total = scalarSubquery(daily.agg(coalesce(sum(col("y")), lit(0L))))
    daily
      .withColumn("dow", expr("CAST((day + 4) % 7 AS INT)"))
      .groupBy(col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("y")).as("dow_cents"))
      .withColumn("nd", nDays).withColumn("tot", total)
      .withColumn("seasonal_micro", expr(
        """CASE WHEN n_days * tot = 0 THEN CAST(0 AS BIGINT)
          |ELSE CAST((1000000 * CAST(dow_cents AS DECIMAL(38,0)) * nd)
          |          DIV (CAST(n_days AS DECIMAL(38,0)) * tot) AS BIGINT)
          |END""".stripMargin))
      .select(col("dow"), col("n_days"), col("dow_cents"), col("seasonal_micro"))
      .orderBy(col("dow"))
  }

  /** Growth accounting — the DAU / new-user / cumulative-user triple
    * every product dashboard opens with: per day, distinct active users,
    * users seen for the FIRST time, and the running total of distinct
    * users ever seen. The "running distinct" is the part a naive window
    * cannot do at scale (collect_set over an unbounded frame holds the
    * universe per row); the scalable identity is first-occurrence
    * attribution — cum_users(d) = Σ_{d'≤d} new_users(d') — which turns
    * the running distinct into a per-user min() plus a prefix sum over
    * the tiny day relation.
    *
    * Scale shape: one (day,user) distinct, one per-user min rollup —
    * both key-partitioned map-side-partial shuffles — then day-level
    * joins and ONE |days|-sized window. */
  def userGrowth(spark: SparkSession, dir: String): DataFrame = {
    val dayUser = events(spark, dir)
      .select(expr("ts DIV 86400000000000L").as("day"), col("user_id"))
      .distinct()
      .localCheckpoint(eager = true)
    val dau = dayUser.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val newUsers = dayUser.groupBy(col("user_id")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    dau.join(newUsers, Seq("day"), "left")
      .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
      .withColumn("cum_users", sum(col("new_users")).over(
        Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("day"), col("dau"), col("new_users"), col("cum_users"))
      .orderBy(col("day"))
  }

  /** CUSUM change-point detection (Page 1954) on the daily revenue
    * series: cumulative sums of mean-centered deviations peak at the
    * point where the series' level shifts — argmax |CUSUM| is the classic
    * single-change-point locator behind SPC dashboards and regression
    * detectors.
    *
    * Exactness device: the same n-scaled integer mean-centering as
    * [[SpatialCluster.moransI]] (z_d = n·y_d − S so no division happens),
    * prefix sums in DECIMAL(38,0), the change point = (|C| desc, day asc)
    * row 1 — total order, engine-identical. Emitted as the day, the
    * excursion sign, and |C|·10⁶ DIV (n·S) — the excursion as a ppm
    * fraction of total scaled volume.
    *
    * Scale shape: one day rollup (the only data-sized pass), one
    * |days|-sized window prefix sum, single-row output. */
  def cusum(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .withColumn("day", expr("ts DIV 86400000000000L"))
      .withColumn("cents", expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
      .groupBy(col("day")).agg(sum(col("cents")).as("y"))
      .localCheckpoint(eager = true)
    import org.apache.spark.sql.graftbridge.Bridge.scalarSubquery
    val nS = scalarSubquery(daily.agg(count(lit(1))))
    val sS = scalarSubquery(daily.agg(coalesce(sum(col("y")), lit(0L))))
    daily
      .withColumn("n0", nS).withColumn("s0", sS)
      .withColumn("z", expr("CAST(n0 AS DECIMAL(38,0)) * y - s0"))
      .withColumn("c", sum(col("z")).over(
        Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(Window.orderBy(abs(col("c")).desc, col("day"))))
      .filter(col("rn") === 1)
      .select(col("day").as("cp_day"), col("n0").as("n_days"),
        expr("CAST(CASE WHEN c > 0 THEN 1 WHEN c < 0 THEN -1 ELSE 0 END AS INT)").as("cusum_sign"),
        expr("""CASE WHEN n0 * s0 = 0 THEN CAST(0 AS BIGINT)
               |ELSE CAST((1000000 * abs(c)) DIV (CAST(n0 AS DECIMAL(38,0)) * s0) AS BIGINT)
               |END""".stripMargin).as("excursion_ppm"))
  }

  /** Zero-filled hour-of-day event density over the `graft_series` TABLE
    * FUNCTION (`GraftSparkExtensions.injectTableFunction` — the TVF rung
    * of the extension ladder): the dense axis comes from SQL-surface
    * `graft_series(0, 24)`, which resolves straight to the catalyst
    * `Range` node (no data source, closed-form stats, splittable).
    *
    * Scale shape: events AGGREGATE to ≤24 rows BEFORE touching the grid,
    * so the dense-axis left join is a 24×24 join of two bounded
    * relations — never "join the grid against the corpus and hope the
    * 24-key shuffle doesn't skew". The zero-fill (hours with no events
    * survive with count 0) is the property a bare GROUP BY can't give. */
  def tvfHourGrid(spark: SparkSession, dir: String): DataFrame = {
    events(spark, dir).createOrReplaceTempView("graft_events_tvf")
    spark.sql(
      """WITH e AS (
        |  SELECT (ts DIV 3600000000000L) % 24 AS hour,
        |         count(*) AS n_events,
        |         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS sum_cents
        |  FROM graft_events_tvf WHERE value IS NOT NULL
        |  GROUP BY 1)
        |SELECT g.id AS hour,
        |  coalesce(e.n_events, CAST(0 AS BIGINT)) AS n_events,
        |  coalesce(e.sum_cents, CAST(0 AS BIGINT)) AS sum_cents
        |FROM graft_series(0, 24) g
        |LEFT JOIN e ON g.id = e.hour
        |ORDER BY hour""".stripMargin)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tvf_grid" -> (tvfHourGrid _),
    "q_kmv_overlap" -> ((s, d) => kmvOverlap(s, d)),
    "q_sketch_reagg" -> ((s, d) => sketchReagg(s, d)),
    "q_max_concurrency" -> (maxConcurrency _),
    "q_quantile_reagg" -> ((s, d) => quantileReagg(s, d)),
    "q_theil_sen" -> (theilSen _),
    "q_cusum" -> (cusum _),
    "q_user_growth" -> (userGrowth _),
    "q_ab_test" -> (abTest _),
    "q_poisson_bootstrap" -> ((s, d) => poissonBootstrap(s, d)),
    "q_gini_spend" -> (giniSpend _),
    "q_rfm" -> (rfm _),
    "q_seasonality" -> (seasonality _),
    "q_funnel_steps" -> ((s, d) => funnelSteps(s, d)),
    "q_bitmap_overlap" -> ((s, d) => bitmapOverlap(s, d)),
    "q_markov" -> (markovTransitions _),
    "q_histogram2d" -> ((s, d) => histogram2d(s, d)),
    "q_sessionize" -> (sessionize _),
    "q_window_funnel" -> ((s, d) => windowFunnel(s, d)),
    "q_session_window" -> (sessionWindowAgg _),
    "q_spike_days" -> (spikeDays _),
    "q_cms_frequency" -> (cmsFrequency _),
    "q_decay_count" -> (decayCount _),
    "q_active_users" -> (activeUsers _),
    "q_grid_fill" -> (gridFill _),
    "q_pit_join" -> (pitJoin _),
    "q_cogroup" -> (cogroupProfile _),
    "q_topk_agg" -> (topkAgg _),
    "q_path_mining" -> ((s, d) => pathMining(s, d)),
    "q_mad_outliers" -> (madOutliers _),
    "q_cooccurrence" -> (cooccurrence _),
    "q_scd2" -> (scd2 _),
    "q_funnel" -> ((s, d) => funnel(s, d)),
    "q_ewma" -> ((s, d) => ewma(s, d)),
    "q_twap" -> (twap _),
    "q_time_to_convert" -> (timeToConvert _),
    "q_attribution" -> (attribution _),
    "q_streaks" -> (streaks _),
    "q_ohlc" -> (ohlcBars _),
    "q_resample_locf" -> (resampleLocf _),
    "q_resample_linear" -> (resampleLinear _),
    "q_interval_union" -> ((s, d) => intervalUnion(s, d)),
    "q_retention" -> (retention _),
    "q_event_type_agg" -> (eventTypeAgg _),
    "q_window_range" -> (windowRange _),
    "q_sliding_window" -> (slidingWindow _),
    "q_histogram" -> ((s, d) => histogram(s, d)),
  )

  val oracles: Map[String, String] = Map(
    "q_ewma" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000000 AS tms,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |w AS (
        |  SELECT user_id, tms, event_id,
        |    coalesce(lag(cents, 0) OVER win, 0) * 128 +
        |    coalesce(lag(cents, 1) OVER win, 0) * 64 +
        |    coalesce(lag(cents, 2) OVER win, 0) * 32 +
        |    coalesce(lag(cents, 3) OVER win, 0) * 16 +
        |    coalesce(lag(cents, 4) OVER win, 0) * 8 +
        |    coalesce(lag(cents, 5) OVER win, 0) * 4 +
        |    coalesce(lag(cents, 6) OVER win, 0) * 2 +
        |    coalesce(lag(cents, 7) OVER win, 0) * 1 AS w,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY tms DESC, event_id DESC) AS rd
        |  FROM e
        |  WINDOW win AS (PARTITION BY user_id ORDER BY tms, event_id))
        |SELECT user_id, count(*) AS n_events,
        |  CAST(max(CASE WHEN rd = 1 THEN w END) AS BIGINT) AS ewma_last_x256,
        |  CAST(sum(w) AS BIGINT) AS sum_ewma_x256
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_time_to_convert" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000000 AS tms FROM events),
        |s AS (
        |  SELECT user_id, min(tms) AS t0 FROM e
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |conv AS (
        |  SELECT e.user_id, min(e.tms) - min(s.t0) AS delta_ms
        |  FROM e JOIN s ON e.user_id = s.user_id
        |  WHERE e.event_type = 'purchase' AND e.tms > s.t0
        |  GROUP BY e.user_id),
        |r AS (
        |  SELECT delta_ms,
        |    row_number() OVER (ORDER BY delta_ms, user_id) AS rn,
        |    count(*) OVER () AS n
        |  FROM conv),
        |med AS (SELECT n, delta_ms AS median_ms FROM r WHERE rn = (n + 1) // 2)
        |SELECT CAST(med.n AS BIGINT) AS n_converters,
        |  CAST(a.min_ms AS BIGINT) AS min_ms,
        |  CAST(med.median_ms AS BIGINT) AS median_ms,
        |  CAST(a.max_ms AS BIGINT) AS max_ms,
        |  CAST(a.sum_ms AS BIGINT) AS sum_ms
        |FROM med, (SELECT min(delta_ms) AS min_ms, max(delta_ms) AS max_ms,
        |           sum(delta_ms) AS sum_ms FROM conv) a""".stripMargin,
    "q_twap" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000000 AS tms,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |d AS (
        |  SELECT user_id, tms, event_id, cents,
        |    coalesce(lead(tms, 1) OVER win - tms, 0) AS dur_ms,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY tms DESC, event_id DESC) AS rd
        |  FROM e
        |  WINDOW win AS (PARTITION BY user_id ORDER BY tms, event_id)),
        |a AS (
        |  SELECT user_id, count(*) AS n_events,
        |    CAST(sum(cents * dur_ms) AS BIGINT) AS mass_cents_ms,
        |    CAST(sum(dur_ms) AS BIGINT) AS span_ms,
        |    CAST(max(CASE WHEN rd = 1 THEN cents END) AS BIGINT) AS last_cents
        |  FROM d GROUP BY user_id)
        |SELECT user_id, n_events, mass_cents_ms, span_ms,
        |  CASE WHEN span_ms = 0 THEN last_cents
        |       ELSE mass_cents_ms // span_ms END AS twap_cents
        |FROM a ORDER BY user_id""".stripMargin,
    "q_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000000 AS tms,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |c AS (
        |  SELECT event_type, cents,
        |    first_value(CASE WHEN event_type IN ('view','click') THEN event_type END
        |                IGNORE NULLS) OVER win AS ft,
        |    last_value(CASE WHEN event_type IN ('view','click') THEN event_type END
        |               IGNORE NULLS) OVER win AS lt
        |  FROM e
        |  WINDOW win AS (PARTITION BY user_id ORDER BY tms, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |m AS (
        |  SELECT 'first' AS model, coalesce(ft, 'organic') AS channel, cents
        |  FROM c WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT 'last' AS model, coalesce(lt, 'organic') AS channel, cents
        |  FROM c WHERE event_type = 'purchase')
        |SELECT model, channel, count(*) AS n_purchases,
        |  CAST(sum(cents) AS BIGINT) AS attributed_cents
        |FROM m GROUP BY model, channel ORDER BY model, channel""".stripMargin,
    "q_streaks" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
        |  FROM events),
        |i AS (
        |  SELECT user_id,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS anchor
        |  FROM d),
        |runs AS (
        |  SELECT user_id, anchor, count(*) AS len FROM i GROUP BY user_id, anchor)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        |  count(*) AS n_streaks, CAST(max(len) AS BIGINT) AS max_streak
        |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_ohlc" ->
      """WITH e AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS day, event_id,
        |    epoch_ns(ts) // 1000000 AS tms,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT day, cents,
        |    row_number() OVER (PARTITION BY day ORDER BY tms, event_id) AS ra,
        |    row_number() OVER (PARTITION BY day ORDER BY tms DESC, event_id DESC) AS rd
        |  FROM e)
        |SELECT day,
        |  CAST(max(CASE WHEN ra = 1 THEN cents END) AS BIGINT) AS open,
        |  CAST(max(cents) AS BIGINT) AS high,
        |  CAST(min(cents) AS BIGINT) AS low,
        |  CAST(max(CASE WHEN rd = 1 THEN cents END) AS BIGINT) AS close,
        |  count(*) AS n_events,
        |  CAST(sum(cents) AS BIGINT) AS turnover_cents
        |FROM r GROUP BY day ORDER BY day""".stripMargin,
    "q_tvf_grid" ->
      """WITH g AS (SELECT unnest(range(0, 24)) AS hour),
        |e AS (
        |  SELECT (epoch_ns(ts) // 3600000000000) % 24 AS hour,
        |    count(*) AS n_events,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS sum_cents
        |  FROM events WHERE value IS NOT NULL GROUP BY 1)
        |SELECT g.hour, CAST(coalesce(e.n_events, 0) AS BIGINT) AS n_events,
        |  CAST(coalesce(e.sum_cents, 0) AS BIGINT) AS sum_cents
        |FROM g LEFT JOIN e ON g.hour = e.hour
        |ORDER BY g.hour""".stripMargin,
    "q_bitmap_overlap" ->
      """WITH a AS (
        |  SELECT DISTINCT event_id FROM events WHERE event_type = 'click'),
        |b AS (
        |  SELECT DISTINCT event_id FROM events WHERE value > 100.0),
        |s AS (SELECT
        |  (SELECT count(*) FROM a) AS n_click,
        |  (SELECT count(*) FROM b) AS n_highval,
        |  (SELECT count(*) FROM (SELECT event_id FROM a INTERSECT
        |                         SELECT event_id FROM b)) AS n_inter,
        |  (SELECT count(*) FROM (SELECT event_id FROM a UNION
        |                         SELECT event_id FROM b)) AS n_union)
        |SELECT CAST(n_click AS BIGINT) AS n_click,
        |  CAST(n_highval AS BIGINT) AS n_highval,
        |  CAST(n_inter AS BIGINT) AS n_inter,
        |  CAST(n_union AS BIGINT) AS n_union,
        |  CAST((1000000 * n_inter) // greatest(n_union, 1) AS BIGINT)
        |    AS jaccard_ppm
        |FROM s""".stripMargin,
    "q_funnel_steps" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000000 AS tms
        |  FROM events),
        |s1 AS (
        |  SELECT user_id, min(tms) AS tp, min(tms) AS t1 FROM e
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.tms) AS tp, min(s1.t1) AS t1
        |  FROM e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'view' AND e.tms > s1.tp
        |    AND e.tms <= s1.t1 + 43200000
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(e.tms) AS tp, min(s2.t1) AS t1
        |  FROM e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'click' AND e.tms > s2.tp
        |    AND e.tms <= s2.t1 + 43200000
        |  GROUP BY e.user_id),
        |s4 AS (
        |  SELECT e.user_id, min(e.tms) AS tp
        |  FROM e JOIN s3 ON e.user_id = s3.user_id
        |  WHERE e.event_type = 'purchase' AND e.tms > s3.tp
        |    AND e.tms <= s3.t1 + 43200000
        |  GROUP BY e.user_id),
        |d AS (
        |  SELECT user_id, max(d) AS depth FROM (
        |    SELECT user_id, 1 AS d FROM s1
        |    UNION ALL SELECT user_id, 2 FROM s2
        |    UNION ALL SELECT user_id, 3 FROM s3
        |    UNION ALL SELECT user_id, 4 FROM s4)
        |  GROUP BY user_id)
        |SELECT CAST(depth AS INTEGER) AS depth, count(*) AS n_users
        |FROM d GROUP BY depth ORDER BY depth""".stripMargin,
    "q_seasonality" ->
      """WITH daily AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |g AS (SELECT count(*) AS nd, coalesce(sum(y), 0) AS tot FROM daily),
        |d AS (
        |  SELECT CAST((day + 4) % 7 AS INTEGER) AS dow, count(*) AS n_days,
        |    CAST(sum(y) AS BIGINT) AS dow_cents
        |  FROM daily GROUP BY 1)
        |SELECT dow, CAST(n_days AS BIGINT) AS n_days, dow_cents,
        |  CAST(CASE WHEN n_days * tot = 0 THEN 0
        |       ELSE (1000000 * CAST(dow_cents AS HUGEINT) * nd)
        |            // (CAST(n_days AS HUGEINT) * tot) END AS BIGINT)
        |    AS seasonal_micro
        |FROM d, g ORDER BY dow""".stripMargin,
    "q_rfm" ->
      """WITH pu AS (
        |  SELECT user_id, max(epoch_ns(ts) // 86400000000000) AS last_day,
        |    count(*) AS freq,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS monetary
        |  FROM events GROUP BY user_id),
        |s AS (
        |  SELECT *,
        |    ntile(5) OVER (ORDER BY last_day, user_id) AS r_q,
        |    ntile(5) OVER (ORDER BY freq, user_id) AS f_q,
        |    ntile(5) OVER (ORDER BY monetary, user_id) AS m_q
        |  FROM pu)
        |SELECT CAST(r_q AS INTEGER) AS r_q, CAST(f_q AS INTEGER) AS f_q,
        |  CAST(m_q AS INTEGER) AS m_q, count(*) AS n_users,
        |  CAST(sum(monetary) // count(*) AS BIGINT) AS avg_cents
        |FROM s GROUP BY r_q, f_q, m_q
        |ORDER BY r_q, f_q, m_q""".stripMargin,
    "q_ab_test" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
        |    (((min(user_id) % 1000000007 + 1000000007) % 1000000007)
        |     * 2654435761) % 2 AS arm
        |  FROM events GROUP BY user_id),
        |a AS (
        |  SELECT
        |    count(*) FILTER (WHERE arm = 0) AS n1,
        |    count(*) FILTER (WHERE arm = 1) AS n2,
        |    coalesce(sum(converted) FILTER (WHERE arm = 0), 0) AS c1,
        |    coalesce(sum(converted) FILTER (WHERE arm = 1), 0) AS c2
        |  FROM pu),
        |z AS (
        |  SELECT *,
        |    CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1 AS num,
        |    CAST(n1 AS HUGEINT) * n2 * (c1 + c2)
        |      * (CAST(n1 AS HUGEINT) + n2 - c1 - c2) AS den
        |  FROM a),
        |e AS (
        |  SELECT n1, c1, n2, c2,
        |    CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END
        |      AS INTEGER) AS z_sign,
        |    CAST(CASE WHEN den = 0 THEN 0
        |         ELSE (1000000 * num * num * (CAST(n1 AS HUGEINT) + n2)) // den
        |         END AS BIGINT) AS z_sq_micro
        |  FROM z)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(c1 AS BIGINT) AS c1,
        |  CAST(n2 AS BIGINT) AS n2, CAST(c2 AS BIGINT) AS c2,
        |  z_sign, z_sq_micro, z_sq_micro > 3841600 AS significant_95
        |FROM e""".stripMargin,
    // same md5-hex draw, same six CDF thresholds, same weight cap
    "q_poisson_bootstrap" ->
      """WITH reps AS (SELECT unnest(range(32)) AS b),
        |w AS (
        |  SELECT o_orderpriority AS priority, b,
        |    CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR) || ':'
        |                         || CAST(b AS VARCHAR)), 1, 15)
        |              < '5e2d58d8b3bce00' THEN 0
        |         WHEN substr(md5(CAST(o_orderkey AS VARCHAR) || ':'
        |                         || CAST(b AS VARCHAR)), 1, 15)
        |              < 'bc5ab1b16779c00' THEN 1
        |         WHEN substr(md5(CAST(o_orderkey AS VARCHAR) || ':'
        |                         || CAST(b AS VARCHAR)), 1, 15)
        |              < 'eb715e1dc158300' THEN 2
        |         WHEN substr(md5(CAST(o_orderkey AS VARCHAR) || ':'
        |                         || CAST(b AS VARCHAR)), 1, 15)
        |              < 'fb23979734a2580' THEN 3
        |         WHEN substr(md5(CAST(o_orderkey AS VARCHAR) || ':'
        |                         || CAST(b AS VARCHAR)), 1, 15)
        |              < 'ff1025f59174e00' THEN 4
        |         WHEN substr(md5(CAST(o_orderkey AS VARCHAR) || ':'
        |                         || CAST(b AS VARCHAR)), 1, 15)
        |              < 'ffd90f3ba405600' THEN 5
        |         ELSE 6 END AS w,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders CROSS JOIN reps)
        |SELECT priority, CAST(b AS INT) AS b,
        |  CAST(sum(w) AS BIGINT) AS n_eff,
        |  CAST(sum(w * cents) AS BIGINT) AS sum_cents,
        |  CASE WHEN sum(w) > 0
        |       THEN CAST(sum(w * cents) AS BIGINT) // CAST(sum(w) AS BIGINT)
        |       ELSE NULL END AS mean_cents
        |FROM w GROUP BY priority, b ORDER BY priority, b""".stripMargin,
    "q_gini_spend" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY user_id),
        |r AS (
        |  SELECT y, row_number() OVER (ORDER BY y, user_id) AS i FROM pu),
        |a AS (
        |  SELECT count(*) AS n_users, coalesce(sum(y), 0) AS total_cents,
        |    coalesce(sum(CAST(i AS HUGEINT) * y), 0) AS wsum
        |  FROM r)
        |SELECT CAST(n_users AS BIGINT) AS n_users,
        |  CAST(total_cents AS BIGINT) AS total_cents,
        |  CAST(CASE WHEN n_users * total_cents = 0 THEN 0
        |       ELSE (1000000 * (2 * wsum - (CAST(n_users AS HUGEINT) + 1) * total_cents))
        |            // (CAST(n_users AS HUGEINT) * total_cents)
        |       END AS BIGINT) AS gini_ppm
        |FROM a""".stripMargin,
    "q_user_growth" ->
      """WITH du AS (
        |  SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS day, user_id
        |  FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
        |fu AS (SELECT user_id, min(day) AS day FROM du GROUP BY user_id),
        |nu AS (SELECT day, count(*) AS new_users FROM fu GROUP BY day)
        |SELECT dau.day, CAST(dau.dau AS BIGINT) AS dau,
        |  CAST(coalesce(nu.new_users, 0) AS BIGINT) AS new_users,
        |  CAST(sum(coalesce(nu.new_users, 0)) OVER (
        |    ORDER BY dau.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_users
        |FROM dau LEFT JOIN nu ON dau.day = nu.day
        |ORDER BY dau.day""".stripMargin,
    "q_theil_sen" ->
      """WITH daily AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |pairs AS (
        |  SELECT a.day AS xa, b.day AS xb,
        |    CAST(CASE WHEN b.y >= a.y
        |      THEN (1000000 * CAST(b.y - a.y AS HUGEINT)) // (b.day - a.day)
        |      ELSE -((1000000 * CAST(a.y - b.y AS HUGEINT)) // (b.day - a.day))
        |    END AS BIGINT) AS slope_micro
        |  FROM daily a JOIN daily b ON a.day < b.day),
        |ranked AS (
        |  SELECT slope_micro, row_number() OVER (ORDER BY slope_micro, xa, xb) AS rn
        |  FROM pairs),
        |s AS (SELECT (SELECT count(*) FROM daily) AS n_days,
        |             (SELECT count(*) FROM pairs) AS n_pairs)
        |SELECT CAST(n_days AS BIGINT) AS n_days,
        |  CAST(n_pairs AS BIGINT) AS n_pairs,
        |  (SELECT slope_micro FROM ranked, s WHERE rn = (n_pairs + 1) // 2)
        |    AS sen_slope_micro
        |FROM s""".stripMargin,
    "q_cusum" ->
      """WITH daily AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |g AS (SELECT count(*) AS n, coalesce(sum(y), 0) AS s FROM daily),
        |c AS (
        |  SELECT day, g.n AS n0, g.s AS s0,
        |    sum(CAST(g.n AS HUGEINT) * y - g.s)
        |      OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
        |            AND CURRENT ROW) AS c
        |  FROM daily, g),
        |top AS (
        |  SELECT *, row_number() OVER (ORDER BY abs(c) DESC, day) AS rn FROM c)
        |SELECT day AS cp_day, CAST(n0 AS BIGINT) AS n_days,
        |  CAST(CASE WHEN c > 0 THEN 1 WHEN c < 0 THEN -1 ELSE 0 END
        |    AS INTEGER) AS cusum_sign,
        |  CAST(CASE WHEN n0 * s0 = 0 THEN 0
        |       ELSE (1000000 * abs(c)) // (CAST(n0 AS HUGEINT) * s0)
        |       END AS BIGINT) AS excursion_ppm
        |FROM top WHERE rn = 1""".stripMargin,
    // contract mirror (quantileSketchAudit device): exact n + TRUE — a
    // re-agg defect beyond the rank bound is a hash mismatch
    "q_quantile_reagg" ->
      """SELECT event_type, count(*) AS n, true AS in_spec
        |FROM events WHERE value IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // same sweep: RANGE-framed running sum over (t, delta DESC) peers
    "q_max_concurrency" ->
      """WITH spans AS (
        |  SELECT user_id, (epoch_ns(ts) // 1000000) // 86400000 AS day,
        |         min(epoch_ns(ts) // 1000000) AS t0,
        |         max(epoch_ns(ts) // 1000000) AS t1
        |  FROM events GROUP BY user_id, day),
        |pts AS (
        |  SELECT day, t0 AS t, 1 AS delta FROM spans
        |  UNION ALL
        |  SELECT day, t1 AS t, -1 AS delta FROM spans),
        |sw AS (
        |  SELECT day, delta,
        |    sum(delta) OVER (PARTITION BY day ORDER BY t ASC, delta DESC
        |                     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS live
        |  FROM pts)
        |SELECT CAST(day AS BIGINT) AS day,
        |  CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_users,
        |  CAST(max(live) AS BIGINT) AS max_concurrent
        |FROM sw GROUP BY day ORDER BY day""".stripMargin,
    // merge == rebuild: the oracle takes the k smallest distinct hashes
    // straight from raw events per type — the law the engine's stored-
    // sketch rollup is proven equal to
    "q_sketch_reagg" ->
      """WITH hh AS (
        |  SELECT DISTINCT event_type,
        |    (((user_id % 1000000007 + 1000000007) % 1000000007)
        |     * 2654435761) % 2147483648 AS h
        |  FROM events),
        |rk AS (
        |  SELECT event_type, h,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS r
        |  FROM hh),
        |sk AS (
        |  SELECT event_type, count(*) AS m, max(h) AS hk
        |  FROM rk WHERE r <= 64 GROUP BY event_type),
        |ex AS (
        |  SELECT event_type, count(DISTINCT user_id) AS n_exact
        |  FROM events GROUP BY event_type),
        |e AS (
        |  SELECT sk.event_type,
        |    CASE WHEN m < 64 THEN m ELSE (63 * 2147483648) // hk END AS n_est,
        |    n_exact
        |  FROM sk JOIN ex ON sk.event_type = ex.event_type)
        |SELECT event_type, CAST(n_est AS BIGINT) AS n_est,
        |  CAST(n_exact AS BIGINT) AS n_exact,
        |  CAST((1000000 * abs(n_est - n_exact)) // greatest(n_exact, 1)
        |       AS BIGINT) AS err_ppm
        |FROM e ORDER BY event_type""".stripMargin,
    "q_kmv_overlap" ->
      """WITH ha AS (
        |  SELECT DISTINCT
        |    (((user_id % 1000000007 + 1000000007) % 1000000007)
        |     * 2654435761) % 2147483648 AS h
        |  FROM events WHERE event_type = 'click'),
        |hb AS (
        |  SELECT DISTINCT
        |    (((user_id % 1000000007 + 1000000007) % 1000000007)
        |     * 2654435761) % 2147483648 AS h
        |  FROM events WHERE event_type = 'view'),
        |ska AS (SELECT h FROM ha ORDER BY h LIMIT 64),
        |skb AS (SELECT h FROM hb ORDER BY h LIMIT 64),
        |mg AS (
        |  SELECT h FROM (SELECT h FROM ska UNION SELECT h FROM skb)
        |  ORDER BY h LIMIT 64),
        |s AS (SELECT
        |  (SELECT count(*) FROM ska) AS sa, (SELECT max(h) FROM ska) AS ka,
        |  (SELECT count(*) FROM skb) AS sb, (SELECT max(h) FROM skb) AS kb,
        |  (SELECT count(*) FROM mg) AS sm, (SELECT max(h) FROM mg) AS km,
        |  (SELECT count(*) FROM mg
        |   WHERE h IN (SELECT h FROM ha) AND h IN (SELECT h FROM hb)) AS ic,
        |  (SELECT count(DISTINCT user_id) FROM events
        |   WHERE event_type = 'click') AS nae,
        |  (SELECT count(DISTINCT user_id) FROM events
        |   WHERE event_type = 'view') AS nbe,
        |  (SELECT count(*) FROM (
        |     SELECT user_id FROM events WHERE event_type = 'click'
        |     INTERSECT
        |     SELECT user_id FROM events WHERE event_type = 'view')) AS ie),
        |e AS (SELECT *,
        |  CASE WHEN sa < 64 THEN sa ELSE (63 * 2147483648) // ka END AS nea,
        |  CASE WHEN sb < 64 THEN sb ELSE (63 * 2147483648) // kb END AS neb,
        |  CASE WHEN sm < 64 THEN sm ELSE (63 * 2147483648) // km END AS ueu
        |  FROM s)
        |SELECT CAST(64 AS INTEGER) AS k,
        |  CAST(nea AS BIGINT) AS n_a_est, CAST(nae AS BIGINT) AS n_a_exact,
        |  CAST(neb AS BIGINT) AS n_b_est, CAST(nbe AS BIGINT) AS n_b_exact,
        |  CAST(ueu AS BIGINT) AS union_est,
        |  CAST(CASE WHEN sm < 64 THEN ic ELSE (ic * ueu) // 64 END AS BIGINT)
        |    AS inter_est,
        |  CAST(ie AS BIGINT) AS inter_exact,
        |  CAST((1000000 * ic) // greatest(sm, 1) AS BIGINT) AS jaccard_ppm
        |FROM e""".stripMargin,
    "q_histogram2d" ->
      """WITH ev AS (
        |  SELECT epoch_ns(ts) AS tns, value FROM events WHERE value IS NOT NULL),
        |b AS (SELECT min(value) AS lo, max(value) AS hi FROM ev),
        |w AS (SELECT lo, CASE WHEN hi = lo THEN 1.0
        |                      ELSE (hi - lo) / 10 END AS w FROM b)
        |SELECT CAST((tns // 3600000000000) % 24 AS INTEGER) AS hour,
        |  CAST(least(floor((value - (SELECT lo FROM w)) / (SELECT w FROM w)),
        |             9) AS INTEGER) AS vbucket,
        |  count(*) AS n
        |FROM ev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_markov" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_ns(ts) AS tns
        |  FROM events),
        |p AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY tns, event_id) AS to_type
        |  FROM e),
        |c AS (
        |  SELECT from_type, to_type, count(*) AS n FROM p
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n, t.n_from,
        |       (1000000 * c.n) // t.n_from AS p_micro
        |FROM c JOIN t ON c.from_type = t.from_type
        |ORDER BY c.from_type, c.to_type""".stripMargin,
    "q_pit_join" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         CAST(epoch_ns(ts) // 1000000 AS BIGINT) AS tms
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, event_type, tms,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |              OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
        |seg AS (
        |  SELECT user_id, event_type, tms,
        |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY tms, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
        |  FROM flagged),
        |iv AS (
        |  SELECT user_id, version, min(event_type) AS state,
        |         min(tms) AS valid_from_ms
        |  FROM seg GROUP BY user_id, version),
        |dim AS MATERIALIZED (
        |  SELECT user_id, version, state, valid_from_ms,
        |         lead(valid_from_ms) OVER (PARTITION BY user_id ORDER BY version)
        |           AS valid_to_ms
        |  FROM iv),
        |probes AS (
        |  SELECT user_id AS p_user,
        |         CAST(epoch_ns(ts) // 1000000 + 1800000 AS BIGINT) AS t
        |  FROM events)
        |SELECT p.p_user AS user_id,
        |       CAST(coalesce(d.version, -1) AS BIGINT) AS version,
        |       coalesce(d.state, 'none') AS state,
        |       count(*) AS n_probes
        |FROM probes p LEFT JOIN dim d
        |  ON p.p_user = d.user_id AND d.valid_from_ms <= p.t
        |     AND (d.valid_to_ms IS NULL OR p.t < d.valid_to_ms)
        |GROUP BY 1, 2, 3 ORDER BY user_id, version""".stripMargin,
    "q_active_users" ->
      """WITH ud AS (
        |  SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS day, user_id
        |  FROM events),
        |b AS (SELECT min(day) + 6 AS lo, max(day) AS hi FROM ud),
        |c AS (
        |  SELECT DISTINCT user_id, day + o.o AS d
        |  FROM ud, (SELECT unnest(range(7)) AS o) o)
        |SELECT d AS day, count(*) AS wau FROM c
        |WHERE d BETWEEN (SELECT lo FROM b) AND (SELECT hi FROM b)
        |GROUP BY d ORDER BY day""".stripMargin,
    "q_grid_fill" ->
      """WITH e AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |daily AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
        |span AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
        |grid AS (
        |  SELECT t.event_type, (SELECT lo FROM span) + g.g AS day
        |  FROM (SELECT DISTINCT event_type FROM e) t,
        |       (SELECT unnest(range((SELECT hi - lo + 1 FROM span))) AS g) g)
        |SELECT grid.event_type, grid.day,
        |       CAST(coalesce(daily.n, 0) AS BIGINT) AS n
        |FROM grid LEFT JOIN daily
        |  ON grid.event_type = daily.event_type AND grid.day = daily.day
        |ORDER BY grid.event_type, grid.day""".stripMargin,
    "q_decay_count" ->
      """WITH d AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |m AS (SELECT max(day) AS md FROM d)
        |SELECT event_type, count(*) AS n,
        |       sum(power(2.0, CAST(day - (SELECT md FROM m) AS DOUBLE)))
        |         AS decayed_n
        |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin,
    // Full kernel replay: FNV-1a over UTF-16 bytes in HUGEINT (the
    // simhash-oracle device), then per sketch row j: bucket = top byte of
    // (h + j·golden)·fnv_prime mod 2^64; every cell is the sum of exact
    // counts of the keys landing in it, and the estimate is the min over
    // rows — bit-identical to CmsKernel by construction.
    "q_cms_frequency" ->
      """WITH keys AS (
        |  SELECT event_type, count(*) AS exact_n FROM events GROUP BY 1),
        |h AS (
        |  SELECT event_type, exact_n,
        |    list_reduce(
        |      list_prepend(14695981039346656037::HUGEINT,
        |        flatten(list_transform(range(CAST(length(event_type) AS BIGINT)),
        |          k -> [ascii(substr(event_type, CAST(k+1 AS INT), 1)) % 256,
        |                ascii(substr(event_type, CAST(k+1 AS INT), 1)) // 256]))),
        |      (h, c) -> ((h - h % 256 +
        |                  CAST(xor(CAST(h % 256 AS BIGINT), CAST(c AS BIGINT)) AS HUGEINT))
        |                 * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT) AS h
        |  FROM keys),
        |b AS (
        |  SELECT event_type, exact_n, j.j,
        |    ((((h + j.j * 11400714819323198485::HUGEINT)
        |        % 18446744073709551616::HUGEINT)
        |       * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT)
        |      // 72057594037927936::HUGEINT AS bucket
        |  FROM h, (SELECT unnest(range(4)) AS j) j),
        |cell AS (SELECT j, bucket, sum(exact_n) AS c FROM b GROUP BY 1, 2),
        |est AS (
        |  SELECT b.event_type, b.exact_n, min(cell.c) AS cms_n
        |  FROM b JOIN cell ON b.j = cell.j AND b.bucket = cell.bucket
        |  GROUP BY 1, 2)
        |SELECT event_type, exact_n, CAST(cms_n AS BIGINT) AS cms_n
        |FROM est ORDER BY event_type""".stripMargin,
    "q_spike_days" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, day, n,
        |    CAST(coalesce(sum(n) OVER tw, 0) AS BIGINT) AS trail7,
        |    count(n) OVER tw AS n_trail_days
        |  FROM daily
        |  WINDOW tw AS (PARTITION BY event_type ORDER BY day
        |                RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, day, n, trail7, n_trail_days,
        |       n_trail_days = 7 AND n * 35 > trail7 * 6 AS is_spike
        |FROM w ORDER BY event_type, day""".stripMargin,
    "q_cogroup" ->
      """WITH e AS (
        |  SELECT user_id AS k, count(*) AS n_events,
        |         CAST(sum(CAST(floor(coalesce(value, 0) * 1000000 + 0.5)
        |           AS BIGINT)) AS BIGINT) AS sum_value_micros
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
        |c AS (
        |  SELECT c_custkey % 150 AS k, count(*) AS n_customers,
        |         CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
        |           AS BIGINT) AS sum_acctbal_cents
        |  FROM customer GROUP BY c_custkey % 150)
        |SELECT coalesce(e.k, c.k) AS user_id,
        |       coalesce(e.n_events, 0) AS n_events,
        |       coalesce(e.sum_value_micros, 0) AS sum_value_micros,
        |       coalesce(c.n_customers, 0) AS n_customers,
        |       coalesce(c.sum_acctbal_cents, 0) AS sum_acctbal_cents
        |FROM e FULL OUTER JOIN c ON e.k = c.k
        |ORDER BY user_id""".stripMargin,
    "q_topk_agg" ->
      """WITH c AS (
        |  SELECT event_type, user_id, count(*) AS cnt FROM events
        |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        |  GROUP BY event_type, user_id),
        |r AS (
        |  SELECT event_type, user_id, cnt,
        |         CAST(row_number() OVER (PARTITION BY event_type
        |           ORDER BY cnt DESC, user_id) AS INTEGER) AS rank
        |  FROM c)
        |SELECT event_type, rank, user_id, cnt FROM r
        |WHERE rank <= 5 ORDER BY event_type, rank""".stripMargin,
    "q_path_mining" ->
      """WITH seq AS (
        |  SELECT event_type,
        |         lead(event_type, 1) OVER w AS t1,
        |         lead(event_type, 2) OVER w AS t2
        |  FROM events WHERE event_type IS NOT NULL
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT concat_ws('>', event_type, t1, t2) AS path, count(*) AS cnt
        |FROM seq WHERE t1 IS NOT NULL AND t2 IS NOT NULL
        |GROUP BY path ORDER BY cnt DESC, path LIMIT 20""".stripMargin,
    "q_mad_outliers" ->
      """WITH ev AS (
        |  SELECT event_type,
        |         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS micros
        |  FROM events WHERE value IS NOT NULL),
        |med AS (
        |  SELECT event_type, quantile_cont(micros, 0.5) AS med
        |  FROM ev GROUP BY event_type),
        |dev AS (
        |  SELECT ev.event_type, abs(ev.micros - med.med) AS absdev, med.med
        |  FROM ev JOIN med USING (event_type)),
        |mad AS (
        |  SELECT event_type, quantile_cont(absdev, 0.5) AS mad, min(med) AS med
        |  FROM dev GROUP BY event_type)
        |SELECT d.event_type, count(*) AS n,
        |       count(*) FILTER (WHERE d.absdev > 3.0 * 1.4826 * m.mad)
        |         AS n_outliers,
        |       min(m.med) AS median_micros, min(m.mad) AS mad_micros
        |FROM dev d JOIN mad m USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,
    "q_cooccurrence" ->
      """WITH ut AS (
        |  SELECT DISTINCT user_id, event_type FROM events
        |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
        |pt AS (SELECT event_type, count(*) AS n_type FROM ut GROUP BY 1),
        |nu AS (SELECT count(DISTINCT user_id) AS n FROM ut),
        |pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |         count(*) AS support
        |  FROM ut a JOIN ut b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b, p.support,
        |       CAST(p.support * (SELECT n FROM nu) AS DOUBLE) /
        |         CAST(pa.n_type * pb.n_type AS DOUBLE) AS lift
        |FROM pairs p
        |JOIN pt pa ON p.type_a = pa.event_type
        |JOIN pt pb ON p.type_b = pb.event_type
        |ORDER BY p.type_a, p.type_b""".stripMargin,
    "q_retention" ->
      """WITH active AS (
        |  SELECT DISTINCT user_id,
        |         (epoch_ns(ts) // 1000000) // 86400000 AS day
        |  FROM events)
        |SELECT a.day, count(*) AS n_active,
        |       CAST(count(b.user_id) AS BIGINT) AS n_retained
        |FROM active a
        |LEFT JOIN active b ON a.user_id = b.user_id AND b.day = a.day + 1
        |GROUP BY a.day ORDER BY a.day""".stripMargin,
    "q_interval_union" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |         CAST(epoch_ns(ts) // 1000000 AS BIGINT) AS tms,
        |         CAST(epoch_ns(ts) // 1000000 AS BIGINT) + 1800000 AS end_ms
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, tms, end_ms,
        |    max(end_ms) OVER (PARTITION BY user_id ORDER BY tms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_end
        |  FROM e),
        |f AS (
        |  SELECT user_id, event_id, tms, end_ms,
        |    CASE WHEN prev_max_end IS NULL OR tms > prev_max_end
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM m),
        |s AS (
        |  SELECT user_id, tms, end_ms,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY tms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
        |  FROM f),
        |seg AS (
        |  SELECT user_id, seg, count(*) AS n_events,
        |         max(end_ms) - min(tms) AS covered_ms
        |  FROM s GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(n_events) AS BIGINT) AS n_events,
        |       count(*) AS n_segments,
        |       CAST(sum(covered_ms) AS BIGINT) AS covered_ms
        |FROM seg GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_resample_linear" ->
      """WITH hourly AS (
        |  SELECT user_id,
        |         (epoch_ns(ts) // 1000000) // 3600000 AS hour,
        |         max(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS sample
        |  FROM events GROUP BY 1, 2),
        |bounds AS (
        |  SELECT user_id, min(hour) AS h0, max(hour) AS h1
        |  FROM hourly GROUP BY 1),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(h0, h1)) AS hour FROM bounds),
        |br AS (
        |  SELECT g.user_id, g.hour, h.sample,
        |    last_value(h.sample IGNORE NULLS) OVER (
        |      PARTITION BY g.user_id ORDER BY g.hour
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_prev,
        |    last_value(CASE WHEN h.sample IS NOT NULL THEN g.hour END IGNORE NULLS) OVER (
        |      PARTITION BY g.user_id ORDER BY g.hour
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h_prev,
        |    first_value(h.sample IGNORE NULLS) OVER (
        |      PARTITION BY g.user_id ORDER BY g.hour
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v_next,
        |    first_value(CASE WHEN h.sample IS NOT NULL THEN g.hour END IGNORE NULLS) OVER (
        |      PARTITION BY g.user_id ORDER BY g.hour
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS h_next
        |  FROM grid g LEFT JOIN hourly h USING (user_id, hour)),
        |f AS (
        |  SELECT user_id, hour, sample,
        |    CASE WHEN v_next IS NULL OR h_next = h_prev THEN v_prev
        |         WHEN v_next >= v_prev THEN
        |           v_prev + ((v_next - v_prev) * (hour - h_prev)) // (h_next - h_prev)
        |         ELSE
        |           v_prev - ((v_prev - v_next) * (hour - h_prev)) // (h_next - h_prev)
        |    END AS interp
        |  FROM br)
        |SELECT user_id, count(*) AS n_points,
        |       CAST(count(sample) AS BIGINT) AS n_observed,
        |       CAST(sum(interp) AS BIGINT) AS sum_interp_micros
        |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_resample_locf" ->
      """WITH hourly AS (
        |  SELECT user_id,
        |         (epoch_ns(ts) // 1000000) // 3600000 AS hour,
        |         max(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS sample
        |  FROM events GROUP BY 1, 2),
        |bounds AS (
        |  SELECT user_id, min(hour) AS h0, max(hour) AS h1
        |  FROM hourly GROUP BY 1),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(h0, h1)) AS hour FROM bounds),
        |filled AS (
        |  SELECT g.user_id, g.hour, h.sample,
        |         last_value(h.sample IGNORE NULLS) OVER (
        |           PARTITION BY g.user_id ORDER BY g.hour
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf
        |  FROM grid g LEFT JOIN hourly h USING (user_id, hour))
        |SELECT user_id, count(*) AS n_points,
        |       CAST(count(sample) AS BIGINT) AS n_observed,
        |       CAST(sum(locf) AS BIGINT) AS sum_filled_micros
        |FROM filled GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |         CAST(epoch_ns(ts) // 1000000 AS BIGINT) AS tms
        |  FROM events),
        |fv AS (
        |  SELECT user_id, min(tms) AS v FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |conv AS (
        |  SELECT DISTINCT e.user_id FROM e JOIN fv USING (user_id)
        |  WHERE e.event_type = 'click'
        |    AND e.tms > fv.v AND e.tms <= fv.v + 3600000)
        |SELECT fv.user_id % 10 AS bucket, count(*) AS n_viewers,
        |       CAST(count(conv.user_id) AS BIGINT) AS n_converted
        |FROM fv LEFT JOIN conv ON fv.user_id = conv.user_id
        |GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         CAST(epoch_ns(ts) // 1000000 AS BIGINT) AS tms
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, event_type, tms,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |              OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
        |seg AS (
        |  SELECT user_id, event_type, tms,
        |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY tms, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
        |  FROM flagged),
        |iv AS (
        |  SELECT user_id, version, min(event_type) AS state,
        |         min(tms) AS valid_from_ms, count(*) AS n_events
        |  FROM seg GROUP BY user_id, version)
        |SELECT user_id, version, state, valid_from_ms,
        |       lead(valid_from_ms) OVER (PARTITION BY user_id ORDER BY version)
        |         AS valid_to_ms,
        |       CAST(n_events AS BIGINT) AS n_events
        |FROM iv ORDER BY user_id, version""".stripMargin,
    "q_histogram" ->
      """WITH e AS (SELECT value FROM events WHERE value IS NOT NULL),
        |b AS (
        |  SELECT min(value) AS lo, max(value) AS hi,
        |         CASE WHEN min(value) = max(value) THEN 1.0
        |              ELSE (max(value) - min(value)) / 20 END AS w
        |  FROM e)
        |SELECT CAST(least(floor((value - lo) / w), 19.0) AS INTEGER) AS bucket,
        |       count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM e, b GROUP BY 1 ORDER BY 1""".stripMargin,
    // every event belongs to windows {floor(t/1h)*1h, that - 1h}: the
    // explicit two-start expansion of Spark's epoch-aligned window(2h, 1h)
    "q_sliding_window" ->
      """WITH e AS (
        |  SELECT CAST(epoch_ns(ts) // 1000000 AS BIGINT) AS tms, event_type
        |  FROM events),
        |x AS (
        |  SELECT (tms // 3600000) * 3600000 AS w_start_ms, event_type FROM e
        |  UNION ALL
        |  SELECT (tms // 3600000) * 3600000 - 3600000, event_type FROM e)
        |SELECT w_start_ms, event_type, count(*) AS n
        |FROM x GROUP BY 1, 2 ORDER BY w_start_ms, event_type""".stripMargin,
    // the same three stacked running-max windows + end-of-chain window
    // test, replayed over the identical (tms, event_id) strict order
    "q_window_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |         CAST(epoch_ns(ts) // 1000000 AS BIGINT) AS tms, event_type
        |  FROM events),
        |s1t AS (
        |  SELECT user_id, event_id, tms, event_type,
        |    max(CASE WHEN event_type = 'signup' THEN tms END)
        |      OVER (PARTITION BY user_id ORDER BY tms, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS s1
        |  FROM e),
        |c2t AS (
        |  SELECT *, max(CASE WHEN event_type = 'view' THEN s1 END)
        |      OVER (PARTITION BY user_id ORDER BY tms, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS c2
        |  FROM s1t),
        |c3t AS (
        |  SELECT *, max(CASE WHEN event_type = 'click' THEN c2 END)
        |      OVER (PARTITION BY user_id ORDER BY tms, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS c3
        |  FROM c2t),
        |pu AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'signup' THEN 1 END) AS d1,
        |    max(CASE WHEN event_type = 'view'
        |             AND tms - s1 <= 259200000 THEN 1 END) AS d2,
        |    max(CASE WHEN event_type = 'click'
        |             AND tms - c2 <= 259200000 THEN 1 END) AS d3,
        |    max(CASE WHEN event_type = 'purchase'
        |             AND tms - c3 <= 259200000 THEN 1 END) AS d4
        |  FROM c3t GROUP BY user_id),
        |t AS (
        |  SELECT CAST(coalesce(sum(d1), 0) AS BIGINT) AS u1,
        |         CAST(coalesce(sum(d2), 0) AS BIGINT) AS u2,
        |         CAST(coalesce(sum(d3), 0) AS BIGINT) AS u3,
        |         CAST(coalesce(sum(d4), 0) AS BIGINT) AS u4
        |  FROM pu)
        |SELECT * FROM (
        |  SELECT CAST(1 AS INTEGER) AS step, 'signup' AS step_type, u1 AS n_users FROM t
        |  UNION ALL
        |  SELECT CAST(2 AS INTEGER), 'view', u2 FROM t
        |  UNION ALL
        |  SELECT CAST(3 AS INTEGER), 'click', u3 FROM t
        |  UNION ALL
        |  SELECT CAST(4 AS INTEGER), 'purchase', u4 FROM t
        |) ORDER BY step""".stripMargin,
    "q_sessionize" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, value,
         |         CAST(epoch_ns(ts) // 1000000 AS BIGINT) AS tms
         |  FROM events),
         |flagged AS (
         |  SELECT user_id, event_id, tms, value,
         |    CASE WHEN lag(tms) OVER w IS NULL
         |              OR tms - lag(tms) OVER w > $GapMs THEN 1 ELSE 0 END AS is_new
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
         |sessions AS (
         |  SELECT user_id, tms, value,
         |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY tms, event_id
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM flagged)
         |SELECT user_id, session_id, count(*) AS n_events,
         |       CAST(max(tms) - min(tms) AS BIGINT) AS duration_ms,
         |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         |FROM sessions GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin,
    // island-method mirror of the native session_window aggregation:
    // session start = min event time of the island. Boundary law differs
    // from q_sessionize: session_window's [t, t+gap) is half-open, so an
    // event exactly gap later starts a NEW session (>=, not >)
    "q_session_window" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, value,
         |         CAST(epoch_ns(ts) // 1000000 AS BIGINT) AS tms
         |  FROM events),
         |flagged AS (
         |  SELECT user_id, event_id, tms, value,
         |    CASE WHEN lag(tms) OVER w IS NULL
         |              OR tms - lag(tms) OVER w >= $GapMs THEN 1 ELSE 0 END AS is_new
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
         |sessions AS (
         |  SELECT user_id, tms, value,
         |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY tms, event_id
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM flagged)
         |SELECT user_id, CAST(min(tms) AS BIGINT) AS start_ms,
         |       count(*) AS n_events,
         |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         |FROM sessions GROUP BY user_id, session_id
         |ORDER BY user_id, start_ms""".stripMargin,
    "q_window_range" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value,
        |         CAST(epoch_ns(ts) // 1000000 AS BIGINT) AS tms
        |  FROM events WHERE user_id < 4)
        |SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
        |       PARTITION BY user_id ORDER BY tms
        |       RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS hour_sum
        |FROM e ORDER BY user_id, event_id""".stripMargin,
    "q_event_type_agg" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS n_click,
        |  count(*) FILTER (WHERE event_type = 'view') AS n_view,
        |  count(*) FILTER (WHERE event_type = 'error') AS n_error,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type = 'click') AS DOUBLE) AS click_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
