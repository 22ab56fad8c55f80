package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** Windowing operators beyond the reference's tumbling windows — the
  * capabilities its author wished ClickHouse had (`README.md:376-380`, the
  * "sum over (partition by … range between …)" lament). Both run equally as
  * batch or Structured Streaming aggregations.
  *
  * Scale: both are single-shuffle aggregations. Sliding windows multiply
  * each event into win/slide windows *map-side* (`window()` is a generator),
  * then partial-aggregate before the shuffle; session windows shuffle by
  * key and merge ranges in the state store / agg buffer — no sort-based
  * window functions anywhere.
  */
object Windows {

  /** Calendar gap-fill with last-observation-carried-forward — the
    * dashboard-series primitive t23/t33 stop short of: a key × day grid
    * with no missing days, where each absent day carries the previous
    * day's closing reading (and days before a key's first observation stay
    * NULL — LOCF has nothing to carry). The daily close is the reading at
    * the day's max timestamp (ties → larger scaled value: deterministic,
    * and attested cross-engine since both engines resolve the same
    * two-step max). Readings are centi-scaled longs (the t37 discipline).
    *
    * Scale shape: raw events collapse to (key, day) closes in one partial-
    * agg shuffle; the spine is |keys| × |days| — metadata against the
    * event volume that produced it — and the LOCF window sorts within key
    * partitions of that spine, never over raw events. The span aggregate
    * is a 1-row broadcast.
    */
  def gapFillLocf(events: DataFrame, tsCol: String = "ts",
      keyCol: String = "event_type", valCol: String = "value"): DataFrame = {
    val v = round(col(valCol) * 100).cast("long")
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(max(struct(col(tsCol).as("t"), v.as("v"))).as("m"))
      .select(col(keyCol), col("day"), col("m.v").as("close_c"))
      .persist() // three consumers: span, key domain, and the grid join
    val span = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val spine = daily.select(col(keyCol)).distinct()
      .crossJoin(broadcast(span))
      .select(col(keyCol), explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = W.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(W.unboundedPreceding, 0)
    spine.join(daily, Seq(keyCol, "day"), "left_outer")
      .select(col(keyCol), col("day"),
        last(col("close_c"), ignoreNulls = true).over(w).as("close_filled"),
        col("close_c").isNotNull.cast("int").as("observed"))
  }

  /** Sliding event-time counts: `win`-second windows every `slide` seconds
    * per event_type. An event lands in win/slide windows.
    */
  def slidingCounts(events: DataFrame, tsCol: String = "ts",
      win: Int = 600, slide: Int = 300): DataFrame =
    events
      .groupBy(window(col(tsCol), s"$win seconds", s"$slide seconds").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))

  /** Sliding distinct-user counts — the concurrency dashboard's "unique
    * visitors in the last `win` seconds, refreshed every `slide`": each
    * event lands in win/slide windows (map-side generator, as in
    * [[slidingCounts]]), then a COUNT(DISTINCT user_id) per window.
    *
    * Scale: Spark plans the distinct as Expand + a two-phase aggregate —
    * the (window, user) pairs partial-deduplicate map-side before the
    * shuffle, so the exchange carries at most one row per (window, user)
    * per partition, never one per event; the second aggregate then counts
    * per window. No per-window sort, no state beyond the agg buffers.
    */
  def slidingDistinct(events: DataFrame, tsCol: String = "ts",
      win: Int = 900, slide: Int = 300): DataFrame =
    events
      .groupBy(window(col(tsCol), s"$win seconds", s"$slide seconds").as("w"))
      .agg(countDistinct(col("user_id")).as("distinct_users"),
        count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("distinct_users"),
        col("n_events"))

  /** Inter-event gap statistics per event_type — the LAG/LEAD shape a
    * latency or cadence dashboard runs: for every event, the microseconds
    * since the SAME user's previous event (total order: ts, then event_id,
    * so ties never make the lag nondeterministic), aggregated per
    * event_type of the later event. First events per user have no gap and
    * contribute nothing. Output: (event_type, n_gaps, min_gap_us,
    * max_gap_us, sum_gap_us) — integer microseconds only (no float sums),
    * so the oracle matches exactly.
    *
    * Scale: one shuffle on user_id for the lag window (per-user event
    * streams are small — no single-task key), then a map-side-combined
    * aggregation on event_type. The lag is computed on integer
    * microseconds (`unix_micros`), never on rendered timestamps.
    */
  def interEventGaps(events: DataFrame, tsCol: String = "ts"): DataFrame = {
    val perUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col(tsCol), col("event_id"))
    events
      .withColumn("us", unix_micros(col(tsCol)))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(perUser))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_gaps"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"),
        sum(col("gap_us")).as("sum_gap_us"))
  }

  /** Gap-based sessionization per key: events within `gapSec` of the
    * previous event share a session; the session closes `gapSec` after its
    * last event (Spark `session_window` semantics — a new session starts
    * when the gap is ≥ `gapSec`).
    */
  def sessions(events: DataFrame, keyCol: String, tsCol: String = "ts",
      gapSec: Int = 1800): DataFrame =
    events
      .groupBy(session_window(col(tsCol), s"$gapSec seconds").as("sw"), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col(keyCol),
        col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("n_events"))

  /** Day-over-day trend analytics over the per-type daily counts — the
    * windowed-analytics report shape the reference's author wished for
    * (`README.md:376-380`): running cumulative total, 7-day moving average
    * (over observed days, row-framed), and day-over-day delta, per event
    * type. One map-side-combined count pass reduces the corpus to the
    * (day × type) frame first, so every window function runs over
    * metadata-sized input — no window ever touches raw events, and the
    * per-type partitions are day-count-sized (never a skewed-task risk).
    * ma7 divides an exact integer window sum by an exact window count, so
    * the double is cross-engine bit-stable.
    */
  def dailyTrends(events: DataFrame, tsCol: String = "ts",
      keyCol: String = "event_type"): DataFrame = {
    val daily = events
      .groupBy(to_date(col(tsCol)).as("day"), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
    val byType = W.partitionBy(col(keyCol)).orderBy(col("day"))
    val last7 = byType.rowsBetween(-6, 0)
    daily.select(
      col(keyCol), col("day"), col("n_events"),
      sum(col("n_events")).over(byType.rowsBetween(W.unboundedPreceding, 0))
        .as("cum_events"),
      (sum(col("n_events")).over(last7).cast("double")
        / count(lit(1)).over(last7)).as("ma7"),
      (col("n_events") - coalesce(lag(col("n_events"), 1).over(byType), lit(0L)))
        .as("delta"))
  }

  /** Exponentially time-decayed activity scores — the "trending now"
    * ranking ([[dailyTrends]] reports raw counts; decay answers which keys
    * are hot NOW, with yesterday worth half of today): each event
    * contributes `2^−age_days` of weight relative to the corpus's last
    * day. The decay weight is the INTEGER `10⁶ div 2^min(age, 62)` —
    * a right shift, not a float `pow`, so the score is cross-engine exact
    * (the b28/t48 integer discipline; ages ≥ 20 days decay to 0 ppm
    * exactly, which IS the half-life-1-day contract, and the 62 clamp
    * keeps the shift defined for arbitrarily old corpora).
    *
    * Scale shape: counts reduce per (key, day) FIRST — partial-agg-first,
    * the shuffle carries one row per key×day, never per event; the
    * max-day anchor is a one-row broadcast; the weighting pass runs over
    * the metadata-sized day-count frame. Output: (key, n_events,
    * trend_ppm) with trend_ppm = Σ count(day)·w(age).
    */
  def decayedTrend(events: DataFrame, tsCol: String = "ts",
      keyCol: String = "event_type"): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val anchor = daily.agg(max(col("day")).as("max_day"))
    daily.join(broadcast(anchor))
      .withColumn("age", datediff(col("max_day"), col("day")))
      .withColumn("w", expr("1000000 div shiftleft(cast(1 as bigint), least(age, 62))"))
      .groupBy(col(keyCol))
      .agg(sum(col("n")).as("n_events"),
        sum(col("n") * col("w")).as("trend_ppm"))
  }

  /** Daily distinct-user estimates via HyperLogLog++ — the approximate
    * rollup a 100 TB deployment uses where exact distinct would shuffle
    * every key (SURVEY.md §2.5 "absent from the reference"; exposed because
    * the MV pattern begs for it). No SQL oracle: sketches are
    * engine-specific; the driver records a rows-only check.
    */
  def approxDailyDistinct(events: DataFrame, tsCol: String = "ts",
      keyCol: String = "user_id", rsd: Double = 0.02): DataFrame =
    events
      .groupBy(to_date(col(tsCol)).as("day"), col("event_type"))
      .agg(approx_count_distinct(col(keyCol), rsd).as("approx_users"),
        count(lit(1)).as("n_events"))

  /** [[approxDailyDistinct]] with teeth: the estimate is cross-checked
    * in the same pass against the exact distinct, and any group whose
    * relative error exceeds `tolSigma`·rsd *raises* (`assert_true`) instead
    * of returning a plausible-but-wrong sketch — so a rows-only correctness
    * check on this query actually bounds the sketch. The exact distinct is
    * affordable here because the check runs at test scale; production keeps
    * the unchecked estimator (that's the whole point of the sketch).
    */
  def approxDailyDistinctChecked(events: DataFrame, tsCol: String = "ts",
      keyCol: String = "user_id", rsd: Double = 0.02, tolSigma: Double = 3.0): DataFrame =
    events
      .groupBy(to_date(col(tsCol)).as("day"), col("event_type"))
      .agg(
        approx_count_distinct(col(keyCol), rsd).as("approx_users"),
        count_distinct(col(keyCol)).as("exact_users"),
        count(lit(1)).as("n_events"))
      // greatest(exact, 1): a group whose keys are all NULL has exact = 0
      // (count_distinct ignores NULLs) — the sketch agrees (0), and x/0's
      // NULL would otherwise make assert_true throw on correct data
      .withColumn("rel_err",
        abs(col("approx_users") - col("exact_users")).cast("double")
          / greatest(col("exact_users"), lit(1L)))
      // assert_true yields NULL when the bound holds and raises otherwise;
      // fold it into a writable boolean so the contract is visible in the
      // result schema
      .withColumn("sketch_ok",
        when(assert_true(col("rel_err") <= lit(tolSigma * rsd),
          concat(lit(s"HLL estimate off by more than ${tolSigma}·rsd: rel_err="),
            col("rel_err"))).isNull, lit(true)))

  /** ClickHouse-`windowFunnel` analog: how far does each user progress
    * through an ordered step sequence, with every step inside `windowSec`
    * of the FIRST step's first occurrence and timestamps strictly
    * increasing. Output: (level, n_users) for levels 1..steps.length.
    *
    * Execution shape: one staged aggregation per step — filter the step's
    * events, join the previous stage's per-user anchor (user-count-sized,
    * not event-count-sized), take `min(ts)` past the anchor. No per-user
    * event collection, no window sort: each stage is a filter + hash join
    * + partial-agg'd min, so a 100 TB event log streams through k times
    * (or once, if the k filters are fused into one pass by a caller that
    * pre-splits by type). The per-user frame is the only thing carried
    * between stages.
    */
  def funnel(events: DataFrame, steps: Seq[String], windowSec: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    val stages = funnelStages(events, steps, windowSec, userCol, tsCol, typeCol)
    val levels = stages.zipWithIndex.map { case (s, i) =>
      s.select(col(userCol), lit((i + 1).toLong).as("level"))
    }.reduce(_ union _)
    // a user reaching level k appears in levels 1..k → max per user, then
    // count users per level reached
    levels.groupBy(col(userCol)).agg(max(col("level")).as("level"))
      .groupBy(col("level")).agg(count(lit(1)).as("n_users"))
  }

  /** The staged per-user frames behind [[funnel]]: element i is the frame
    * of users who reached step i+1, carrying the anchor time `t1` and the
    * step's reach time `t_prev`. Shared by the level counts and the
    * latency percentiles.
    */
  private def funnelStages(events: DataFrame, steps: Seq[String], windowSec: Long,
      userCol: String, tsCol: String, typeCol: String): Seq[DataFrame] = {
    require(steps.nonEmpty)
    // stage 1: anchor = first occurrence of the first step
    var stage = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("t1"))
      .withColumn("t_prev", col("t1"))
    val buf = Seq.newBuilder[DataFrame]
    buf += stage
    for (i <- 1 until steps.length) {
      stage = events.filter(col(typeCol) === steps(i))
        .join(stage.select(col(userCol), col("t1"), col("t_prev")), Seq(userCol))
        .filter(col(tsCol) > col("t_prev") &&
          col(tsCol) <= col("t1") + expr(s"INTERVAL $windowSec SECONDS"))
        .groupBy(col(userCol))
        .agg(min(col("t1")).as("t1"), min(col(tsCol)).as("t_prev"))
      buf += stage
    }
    buf.result()
  }

  /** Time-to-convert percentiles — the question the funnel's level counts
    * stop short of: for users who COMPLETED the funnel, how long did the
    * whole path take? Exact p50/p90/p99 of (last-step time − anchor time)
    * in whole seconds, computed with the t19 histogram discipline
    * ([[graft.operators.Percentiles.discrete]]) over the completions
    * frame — the window input is the distinct-elapsed-seconds histogram,
    * never raw completions.
    */
  def funnelLatency(events: DataFrame, steps: Seq[String], windowSec: Long,
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99), userCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type"): DataFrame = {
    val completions =
      funnelStages(events, steps, windowSec, userCol, tsCol, typeCol).last
    val elapsed = completions.select(lit("all").as("funnel"),
      expr("(unix_micros(t_prev) - unix_micros(t1)) div 1000000").as("elapsed_sec"))
    Percentiles.discrete(elapsed, "funnel", col("elapsed_sec"), ps, "pct_sec")
  }

  /** Cohort retention: users grouped by first-activity week (their cohort),
    * counted as retained in week offsets 0..k if they have any event that
    * week. Two aggregations over the event log (first-seen, then
    * user-week activity) joined on the user-sized frame — the standard
    * growth-analytics matrix, shuffle-bounded by distinct (user, week).
    */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val week = (d: org.apache.spark.sql.Column) => date_trunc("week", d)
    val firstSeen = events.groupBy(col(userCol))
      .agg(min(week(col(tsCol))).as("cohort_week"))
    val active = events
      .select(col(userCol), week(col(tsCol)).as("active_week"))
      .distinct()
    active.join(firstSeen, Seq(userCol))
      // integral div: weeks are both Monday-truncated so the day gap is an
      // exact multiple of 7; float division would be exact here but `div`
      // states the intent
      .withColumn("week_offset",
        expr("datediff(active_week, cohort_week) div 7").cast("long"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Peak concurrency per day — the sweep-line over session intervals:
    * how many sessions were simultaneously open at the busiest instant of
    * each day (plus sessions started/ended that day). Sessions are
    * [[sessions]]' half-open [start, end) intervals; each boundary emits a
    * ±1 delta, deltas NET per distinct timestamp (for half-open intervals
    * the concurrency value AT t is prev + net — the intra-instant
    * open-before-close ordering is not an observable state), and the
    * running sum over boundary timestamps is the concurrency step
    * function, whose per-day max is the peak. The capacity-planning query
    * every session store answers.
    *
    * Scale shape: raw events collapse to sessions in one session_window
    * aggregation; boundaries net per timestamp with map-side combine; and
    * the global running sum is [[graft.ops.TextOps.exclusivePrefix]] — the
    * bounded three-level scan (4th consumer, after packing / global
    * shuffle / budget sampling) — never a single-task global-ORDER-BY
    * window over the boundary frame.
    */
  def peakConcurrency(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", gapSec: Int = 1800): DataFrame = {
    val sess = sessions(events, keyCol, tsCol, gapSec)
    val points = sess.select(col("session_start").as("t"), lit(1L).as("delta"))
      .unionAll(sess.select(col("session_end").as("t"), lit(-1L).as("delta")))
    val byTs = points.groupBy(col("t"))
      .agg(sum(col("delta")).as("net"),
        sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("starts"),
        sum(when(col("delta") === -1L, 1L).otherwise(0L)).as("ends"))
      .withColumn("tl", unix_micros(col("t")))
    // bucketWidth 10¹⁰ µs (~2.8 h): a year of boundaries spans ~3·10³
    // buckets, so every scan level stays metadata-sized
    graft.ops.TextOps.exclusivePrefix(byTs, "tl", "tl", "net", 10000000000L)
      .withColumn("open_after", col("_prefix") + col("net"))
      .groupBy(to_date(col("t")).as("day"))
      .agg(max(col("open_after")).as("peak_concurrent"),
        sum(col("starts")).as("sessions_started"),
        sum(col("ends")).as("sessions_ended"))
  }

  /** Semi-structured props analytics — the JSON-column surface: per event
    * type, stats of the numeric `$.k` field extracted straight from the
    * JSON string (no pre-parsed schema), plus a malformed/missing count.
    * The reference's event `props` is exactly this shape (b7 decodes it at
    * ingest; this queries it in place — the "query the JSON you landed"
    * path a CDC store needs when the payload schema drifts faster than
    * the table schema).
    *
    * Scale shape: `get_json_object` is a codegen'd projection in the scan
    * pass; the aggregate is one partial-agg'd |types|-sized frame.
    */
  def propsFieldStats(events: DataFrame, field: String = "k",
      typeCol: String = "event_type"): DataFrame = {
    val v = get_json_object(col("props"), s"$$.$field").cast("long")
    events
      .select(col(typeCol), v.as("v"))
      .groupBy(col(typeCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_missing"),
        sum(col("v")).as("sum_v"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
  }

  /** Hour-of-day seasonality — per event type, the busiest hour (ties to
    * the earlier hour), its event count, and the type's total: the load
    * profile capacity planning and alert-threshold tuning read. One
    * partial-agg'd (type, hour) count — ≤ 24·|types| rows — then one
    * argmax aggregate over that metadata frame.
    */
  def hourlyProfile(events: DataFrame, tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame =
    events
      .groupBy(col(typeCol), hour(col(tsCol)).cast("long").as("hour"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col(typeCol))
      .agg(
        max_by(col("hour"), struct(col("n_events"), -col("hour"))).as("peak_hour"),
        max(struct(col("n_events"), -col("hour"))).getField("n_events").as("peak_events"),
        sum(col("n_events")).as("total_events"))

  /** Top common in-session event paths — "what do users actually do?": the
    * most frequent within-session event-type trigrams, sessions split on
    * the same ≥ gap rule as [[sessions]] (lag-based, so the trigram window
    * and the session id share one per-user sort). Deterministic top-k by
    * (count desc, then the three types asc).
    *
    * Scale shape: two windows over the same per-user (ts, id) sort — one
    * shuffle — then a partial-agg'd trigram count (≤ |types|³ groups,
    * metadata) and TakeOrdered for the top-k; raw events never sort
    * globally.
    */
  def sessionPaths(events: DataFrame, gapSec: Int = 1800, topK: Int = 20,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    val byUser = W.partitionBy(col(userCol)).orderBy(col(tsCol), col("event_id"))
    val sessioned = events
      .withColumn("_prev", lag(col(tsCol), 1).over(byUser))
      .withColumn("_new",
        when(col("_prev").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("_prev")) >= gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("_sid", sum(col("_new")).over(byUser))
    val bySession = W.partitionBy(col(userCol), col("_sid"))
      .orderBy(col(tsCol), col("event_id"))
    sessioned
      .withColumn("step2", lead(col(typeCol), 1).over(bySession))
      .withColumn("step3", lead(col(typeCol), 2).over(bySession))
      .filter(col("step3").isNotNull)
      .groupBy(col(typeCol).as("step1"), col("step2"), col("step3"))
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("step1").asc, col("step2").asc, col("step3").asc)
      .limit(topK)
  }

  /** Daily active/new-user split with cumulative reach — the DAU dashboard:
    * per day, distinct active users, users seen for the FIRST time that
    * day, and the running total of distinct users ever seen. Two
    * partial-agg'd aggregations over the event log (first-seen per user,
    * distinct per day) joined on the day spine; the cumulative window runs
    * over the day-count-sized frame only (a year is 365 rows — metadata,
    * same class as t23's trend windows).
    */
  def newUsersDaily(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val firstSeen = events.groupBy(col(keyCol))
      .agg(min(to_date(col(tsCol))).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    val active = events.select(to_date(col(tsCol)).as("day"), col(keyCol))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("active_users"))
    active.join(firstSeen, Seq("day"), "left")
      .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
      .withColumn("cum_users",
        sum(col("new_users")).over(W.orderBy(col("day"))
          .rowsBetween(W.unboundedPreceding, W.currentRow)))
  }

  /** Event-type transition matrix — first-order Markov behavioral counts:
    * for each (from_type → to_type) pair, how many times a user's next
    * event (by event time, ids breaking ties) was `to_type`, plus the
    * conditional probability in ppm (integer division — cross-engine
    * exact). The "what do users do after X?" query behind funnel design
    * (b19) and sessionization sanity checks.
    *
    * Scale shape: one per-user window (partitions bounded by a user's
    * event count — never a global sort) feeding one partial-agg'd count;
    * the probability window runs over the |types|² count frame, which is
    * metadata-sized.
    */
  def transitionMatrix(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type"): DataFrame = {
    val byUser = W.partitionBy(col(keyCol)).orderBy(col(tsCol), col("event_id"))
    val pairs = events
      .select(col(keyCol), col(tsCol), col("event_id"), col(typeCol))
      .withColumn("next_type", lead(col(typeCol), 1).over(byUser))
      .filter(col("next_type").isNotNull)
    pairs
      .groupBy(col(typeCol).as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .withColumn("from_total",
        sum(col("n_transitions")).over(W.partitionBy(col("from_type"))))
      .withColumn("prob_ppm", expr("(1000000 * n_transitions) div from_total"))
      .drop("from_total")
  }

  /** Per-day event-id gap report — the completeness check a replication
    * DBA runs when downstream counts drift: within each day's id range,
    * how many ids are missing, in how many gaps, and how wide is the
    * worst one? Output: (day, n_events, min_id, max_id, n_missing,
    * n_gaps, max_gap). Duplicate ids never count as gaps (a −1 delta is
    * filtered), and `n_missing` always equals `(max−min+1) − n_events`
    * for unique ids (spec-asserted identity).
    *
    * Scale: the naive form — `lag(id) OVER (PARTITION BY day ORDER BY
    * id)` — puts an entire day (billions of rows at 100 TB) in ONE task.
    * This runs the b22/x45 bounded decomposition instead: ids bucket by
    * `id div bucketWidth`, the lag window partitions by (day, bucket) —
    * bounded tasks — and the gaps that straddle bucket boundaries come
    * from a second lag over the per-bucket (lo, hi) summaries, a
    * metadata-sized frame ordered by bucket (empty buckets are simply
    * absent rows; comparing ids, not bucket indices, keeps their spans
    * counted). The two levels partition the gap set exactly, so the
    * result is identical to the naive form (spec-pinned at a boundary).
    */
  def idGapReport(events: DataFrame, tsCol: String = "ts",
      bucketWidth: Long = 100000L): DataFrame = {
    val base = events
      .select(to_date(col(tsCol)).as("day"), col("event_id"))
      .withColumn("bkt", expr(s"event_id div $bucketWidth"))
    val inBkt = W.partitionBy(col("day"), col("bkt")).orderBy(col("event_id"))
    val perBkt = base
      .withColumn("g", col("event_id") - lag(col("event_id"), 1).over(inBkt) - 1)
      .groupBy(col("day"), col("bkt"))
      .agg(count(lit(1)).as("n"),
        min(col("event_id")).as("lo"), max(col("event_id")).as("hi"),
        sum(when(col("g") > 0, col("g")).otherwise(0L)).as("miss_in"),
        sum(when(col("g") > 0, 1L).otherwise(0L)).as("gaps_in"),
        max(when(col("g") > 0, col("g"))).as("maxgap_in"))
    val perDay = W.partitionBy(col("day")).orderBy(col("bkt"))
    perBkt
      .withColumn("bg", col("lo") - lag(col("hi"), 1).over(perDay) - 1)
      .groupBy(col("day"))
      .agg(sum(col("n")).as("n_events"),
        min(col("lo")).as("min_id"), max(col("hi")).as("max_id"),
        (sum(col("miss_in")) +
          coalesce(sum(when(col("bg") > 0, col("bg"))), lit(0L))).as("n_missing"),
        (sum(col("gaps_in")) +
          coalesce(sum(when(col("bg") > 0, 1L)), lit(0L))).as("n_gaps"),
        greatest(coalesce(max(col("maxgap_in")), lit(0L)),
          coalesce(max(when(col("bg") > 0, col("bg"))), lit(0L))).as("max_gap"))
  }

  /** Daily write-rate anomaly screen — the "did something change?" pass a
    * DBA runs over the portrait's daily counts (b5/b17's frame): each
    * (day, event_type) count is tested against the trailing `trail`
    * observed days' mean ± 3σ. The 3σ test runs in EXACT INTEGER
    * arithmetic — `|x − s/n| > 3·σ_pop` cross-multiplies to
    * `(n·x − s)² > 9·(n·ss − s²)` over the trailing count `n`, sum `s`
    * and sum-of-squares `ss` — so there is no float mean/stddev to drift
    * cross-engine (needs day counts below ~2⁶¹/(3·trail) ≈ 10¹⁷ for the
    * squares; comfortable for any daily partition). Days with fewer than
    * `trail` predecessors are warm-up and emit nothing. Output: (day,
    * event_type, n_events, trail_sum, direction ∈ {high, low, normal}).
    *
    * Scale: the window runs over the aggregated (day × type) frame —
    * metadata-sized — never raw events; the daily aggregation itself is
    * map-side-combined.
    */
  def writeAnomalies(events: DataFrame, tsCol: String = "ts",
      trail: Int = 7): DataFrame = {
    val daily = events
      .groupBy(to_date(col(tsCol)).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val w = W.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-trail, -1)
    daily
      .withColumn("trail_n", count(col("n_events")).over(w))
      .withColumn("trail_sum", sum(col("n_events")).over(w))
      .withColumn("trail_sumsq", sum(col("n_events") * col("n_events")).over(w))
      .filter(col("trail_n") === trail)
      .withColumn("dev", expr(s"$trail * n_events - trail_sum"))
      .withColumn("direction", expr(
        s"""CASE WHEN dev * dev > 9 * ($trail * trail_sumsq - trail_sum * trail_sum)
           |     THEN CASE WHEN dev > 0 THEN 'high' ELSE 'low' END
           |     ELSE 'normal' END""".stripMargin))
      .select(col("day"), col("event_type"), col("n_events"), col("trail_sum"),
        col("direction"))
  }

  /** First-/last-touch conversion attribution — the marketing-analytics
    * question the funnel doesn't answer: each `purchase` is credited to
    * the converting user's EARLIEST (first-touch) and LATEST (last-touch)
    * preceding touch event (`view`/`click`/`signup`) within a `lookbackSec`
    * window; purchases with no in-window touch credit the `direct`
    * channel. Output: one row per (channel, kind∈{first,last}) with the
    * conversion count and the attributed revenue in integer cents.
    *
    * Both touches fall out of ONE per-user RANGE-framed window pass:
    * min/max of a (ts, event_id, channel) struct over the value-domain
    * frame `[-lookback µs, -1]` (peers at the purchase's own timestamp are
    * excluded on both engines; ts ties among touches break on event_id —
    * total-order deterministic). No self-join of events against events —
    * the per-event lookback join a naive implementation writes — and no
    * global sort: one hash exchange on user_id (per-user streams are
    * small), then a map-side-combined metadata-sized aggregation.
    */
  def attribution(events: DataFrame, lookbackSec: Long = 86400L): DataFrame = {
    val touches = Seq("view", "click", "signup")
    val w = W.partitionBy(col("user_id")).orderBy(col("tus"))
      .rangeBetween(-lookbackSec * 1000000L, -1L)
    val tagged = events
      .select(col("user_id"), col("event_type"), col("value"), col("event_id"),
        unix_micros(col("ts")).as("tus"))
      .withColumn("touch", when(col("event_type").isin(touches: _*),
        struct(col("tus"), col("event_id"), col("event_type").as("ch"))))
      .withColumn("ft", min(col("touch")).over(w))
      .withColumn("lt", max(col("touch")).over(w))
    tagged
      .filter(col("event_type") === "purchase")
      .select(col("value"),
        coalesce(col("ft.ch"), lit("direct")).as("first_ch"),
        coalesce(col("lt.ch"), lit("direct")).as("last_ch"))
      .select(col("value"), explode(array(
        struct(lit("first").as("kind"), col("first_ch").as("channel")),
        struct(lit("last").as("kind"), col("last_ch").as("channel")))).as("a"))
      .groupBy(col("a.channel").as("channel"), col("a.kind").as("kind"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_cents"))
  }
}
